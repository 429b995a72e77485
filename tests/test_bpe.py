"""BPE trainer/apply parity against a pure-Python reference implementation
of the textbook algorithm (Sennrich et al. 2016): the iterative operator the
DuckDB oracle cannot express (per-iteration argmax feeds the next rewrite),
so the gate here is exact golden parity with an independent scalar
implementation, same policy as the decode kernels.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from pincspark.operators.vocab import _EOW, bpe_apply, bpe_train

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- reference
def _ref_tokens(text: str, lowercase: bool) -> list[str]:
    if lowercase:
        text = text.lower()
    # must match ws_tokens: split on runs of SPACES (not all whitespace)
    return [t for t in re.split(" +", text) if t]


def _ref_merge(sym: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def ref_bpe_train(
    texts: list[str], n_merges: int, lowercase: bool = True
) -> list[tuple[str, str, int]]:
    wc: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        wc.update(_ref_tokens(t, lowercase))
    syms = {w: list(w[:-1]) + [w[-1] + _EOW] for w in wc}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, sym in syms.items():
            c = wc[w]
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, c))
        syms = {w: _ref_merge(sym, a, b) for w, sym in syms.items()}
    return merges


def ref_bpe_apply(text: str, merges, lowercase: bool = True) -> list[str]:
    ranks = {(a, b): r for r, (a, b, _) in enumerate(merges)}
    out: list[str] = []
    for w in _ref_tokens(text, lowercase):
        sym = list(w[:-1]) + [w[-1] + _EOW]
        while len(sym) >= 2:
            best = min(
                (
                    (ranks[(sym[i], sym[i + 1])], i)
                    for i in range(len(sym) - 1)
                    if (sym[i], sym[i + 1]) in ranks
                ),
                default=None,
            )
            if best is None:
                break
            a, b = merges[best[0]][0], merges[best[0]][1]
            sym = _ref_merge(sym, a, b)
        out.extend(sym)
    return out


# ------------------------------------------------------------------- tests
def test_bpe_train_classic_corpus(spark):
    # the canonical example from the BPE paper, weighted by repetition
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    df = spark.createDataFrame(rows, "text STRING")
    merges = bpe_train(df, n_merges=6)
    assert merges == ref_bpe_train([r[0] for r in rows], 6)
    # first merge of the classic corpus: ('e','s') and ('s','t</w>') tie at
    # 9 (newest x6 + widest x3); lexicographic tie-break picks ('e','s')
    assert merges[0] == ("e", "s", 9)


def test_bpe_train_matches_reference_on_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = bpe_train(docs, n_merges=12, lowercase=False)
    want = ref_bpe_train(texts, 12, lowercase=False)
    assert got == want


def test_bpe_apply_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    texts = [r.text for r in docs.select("doc_id", "text").collect()]
    merges = bpe_train(docs, n_merges=8)
    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe_apply(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    ref = {
        r.doc_id: ref_bpe_apply(r.text, merges)
        for r in docs.select("doc_id", "text").collect()
    }
    assert out == ref
    # round-trip: concatenated tokens reconstruct the whitespace-split words
    some = next(iter(out.values()))
    assert all(t for t in some)


def test_bpe_apply_handles_null_and_empty(spark):
    df = spark.createDataFrame([(1, "low low"), (2, None), (3, "")], "id INT, text STRING")
    merges = bpe_train(df.where("text IS NOT NULL"), n_merges=2)
    rows = {r.id: r.bpe_tokens for r in bpe_apply(df, merges).collect()}
    assert rows[2] is None
    assert rows[3] == []
    assert "".join(rows[1]).replace(_EOW, " ").strip() == "low low"


# ------------------------------------------------------------- properties
from hypothesis import given, settings
from hypothesis import strategies as st

_tok = st.text(alphabet="abcde", min_size=1, max_size=6)


@settings(max_examples=20, deadline=None)
@given(st.lists(_tok, min_size=0, max_size=12), _tok, _tok)
def test_merge_fold_matches_reference_merge(spark, sym, a, b):
    """The JVM left-fold rewrite == the scalar greedy merge, including
    overlap handling (e.g. merging ('a','a') in 'a a a' -> ['aa','a'])."""
    import pyspark.sql.functions as F

    from pincspark.operators.vocab import _merge_pair_expr

    got = (
        spark.createDataFrame([(sym,)], "sym array<string>")
        .select(_merge_pair_expr(F.col("sym"), a, b).alias("m"))
        .head()["m"]
    )
    assert got == _ref_merge(sym, a, b)
