from pincspark.operators.asof import asof_join, asof_join_grouped  # noqa: F401
from pincspark.operators.dedup import (  # noqa: F401
    duplicate_span_stats,
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    remove_duplicate_spans,
    semantic_dedup,
    simhash,
)
from pincspark.operators.geo import (  # noqa: F401
    point_in_polygon,
    spatial_join,
    zone_occupancy,
    zones_df,
)
from pincspark.operators.keyed import (  # noqa: F401
    latest_per_key,
    sessionize,
    validity_intervals,
)
from pincspark.operators.normalize import union_normalize  # noqa: F401
from pincspark.operators.scale import (  # noqa: F401
    bucketed_join,
    salted_join,
    write_bucketed,
)
from pincspark.operators.similarity import cosine_topk, ivf_topk  # noqa: F401
from pincspark.operators.vocab import (  # noqa: F401
    bpe_apply,
    bpe_train,
    vocab_topk,
)
