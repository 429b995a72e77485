"""Perceptual audio hashing (operators/audio_hash.py): gain/container/
replication invariances on planted twins, kernel edge cases, and the
banded pair pipeline end-to-end."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pincspark.operators.audio_hash import (
    audio_contour_hash,
    audio_neardup_pairs,
    decode_audio_hashes,
)
from pincspark.operators.flac import flac_encode
from pincspark.operators.multimodal import au_encode, wav_ima_encode


def _sig(seed: int, blocks: int = 65, width: int = 16) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return np.repeat(rng.randint(1, 120, size=blocks).astype(np.int64), width)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_contour_hash_invariances():
    x = _sig(3)
    h = audio_contour_hash(x)
    assert audio_contour_hash(x * 7) == h          # positive gain
    assert audio_contour_hash(x / 32768.0) == h    # decoder normalization
    assert audio_contour_hash(np.repeat(x, 2)) == h  # 65 | len: exact
    assert audio_contour_hash(-x) == h             # |x| contour
    assert audio_contour_hash(np.array([], dtype=np.int64)) is None
    other = _sig(4)
    assert _hamming(audio_contour_hash(other), h) > 10


def test_decode_audio_hashes_containers_and_gain_agree(spark):
    """One clip, three lossless containers (FLAC / AU linear / WAV
    IMA-ADPCM is LOSSY -> excluded), with a 3x-gain AU twin: hashes
    identical through genuinely different bitstreams; a distinct clip's
    is not."""
    x = _sig(11)
    rows = [
        (1, bytearray(flac_encode(x, rate=8000, mode="fixed2"))),
        (2, bytearray(au_encode(x, 8000, encoding=3))),
        (3, bytearray(au_encode(x * 3, 8000, encoding=3))),  # gain twin
        (4, bytearray(flac_encode(_sig(12), rate=8000, mode="fixed2"))),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY").withColumn(
        "kind", F.lit("audio")
    )
    got = {r["media_id"]: r["ahash"]
           for r in decode_audio_hashes(df, strict=True).collect()}
    assert got[1] == got[2] == got[3] == audio_contour_hash(x)
    assert _hamming(got[4], got[1]) > 10


def test_contour_hash_survives_ima_adpcm_approximately():
    """IMA-ADPCM is lossy (step-size-quantized deltas): the contour hash
    is not bit-pinned through it, but the coarse energy shape survives —
    the operational claim a near-dup tier makes about lossy re-encodes."""
    from pincspark.operators.multimodal import _decode_audio_samples

    x = _sig(21) * 120  # use more of the 16-bit range than the mint
    h = audio_contour_hash(x)
    y, _ = _decode_audio_samples(wav_ima_encode(x, 8000))
    assert _hamming(audio_contour_hash(np.asarray(y)), h) <= 12


def test_audio_neardup_pairs_finds_twin_not_distinct(spark):
    clips = {i: _sig(100 + i) for i in range(5)}
    rows = [(i, bytearray(flac_encode(c, rate=8000, mode="fixed2")))
            for i, c in clips.items()]
    rows.append((1002, bytearray(au_encode(clips[2] * 5, 8000, encoding=3))))
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY").withColumn(
        "kind", F.lit("audio")
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in audio_neardup_pairs(df, strict=True).collect()}
    assert pairs == {(2, 1002): 0}


def test_contour_sql_twin_matches_python_on_random_values():
    """The q113/q114 oracle expression (`plans.queries._contour_hash_sql`)
    and the kernel agree bit-for-bit — checked via DuckDB over random
    65-block value lists, including the signed bit-63 packing."""
    import random

    import duckdb

    from pincspark.plans.queries import _contour_hash_sql

    rng = random.Random(515)
    rows = []
    py = {}
    for i in range(200):
        vals = [rng.randrange(0, 1 << 20) for _ in range(65)]
        rows.append((i, vals))
        py[i] = audio_contour_hash(np.repeat(np.array(vals, dtype=np.int64), 16))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (media_id BIGINT, bv BIGINT[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = dict(
        con.execute(f"SELECT media_id, {_contour_hash_sql()} FROM t").fetchall()
    )
    assert got == py


def test_empty_valid_clip_keeps_row_with_null_hash(spark):
    """ADVICE r14 #1: a decodable-but-EMPTY clip (zero-sample AU) must
    not vanish from the hash output — it gets its row with ahash NULL
    (visible to accounting), and the pair stage ignores NULL
    fingerprints for free (NULL band slices never join)."""
    x = _sig(11)
    empty = np.array([], dtype=np.int64)
    rows = [
        (1, bytearray(au_encode(empty, 8000, encoding=3))),
        (2, bytearray(flac_encode(x, rate=8000, mode="fixed2"))),
        (3, bytearray(au_encode(x, 8000, encoding=3))),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY").withColumn(
        "kind", F.lit("audio")
    )
    got = {r["media_id"]: r["ahash"]
           for r in decode_audio_hashes(df, strict=True).collect()}
    assert set(got) == {1, 2, 3}          # the empty clip is VISIBLE
    assert got[1] is None                 # ... with a NULL fingerprint
    assert got[2] == got[3] is not None
    pairs = audio_neardup_pairs(df, strict=True).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(2, 3)}


def test_degenerate_corpus_cap_bounds_pair_stage(spark):
    """VERDICT r14 #5, audio form: many near-silent clips hash to one
    contour fingerprint; the banding cap skips the oversized bucket
    (bounded pair stage) while honest buckets keep pairing."""
    sil = np.zeros(1040, dtype=np.int64)
    x = _sig(11)
    rows = [(i, bytearray(au_encode(sil, 8000, encoding=3))) for i in range(1, 31)]
    rows += [(101, bytearray(au_encode(x, 8000, encoding=3))),
             (102, bytearray(flac_encode(x, rate=8000, mode="fixed2")))]
    df = spark.createDataFrame(
        rows, "media_id LONG, content BINARY"
    ).withColumn("kind", F.lit("audio"))

    capped = audio_neardup_pairs(df, strict=True, max_bucket_size=10)
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(101, 102)}

    full = audio_neardup_pairs(df, strict=True, max_bucket_size=1000)
    got_full = {(r["id_a"], r["id_b"]) for r in full.collect()}
    assert (101, 102) in got_full and len(got_full) == 30 * 29 // 2 + 1
