"""Query/operator registry.

Every operator exposes a ``Query``: a DataFrame builder ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) a DuckDB oracle string over the same
parquet fixtures.  ``all_queries()`` is the single registry consumed by
``__spark_entry__.py`` (the driver contract) and by ``bench.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL twin; None -> rows-only check
    doc: str = ""


# The driver's correctness sweep grades the FIRST 50 registry entries only
# (observed in CORRECTNESS_r01.json; VERDICT r1 headline finding).  This list
# pins the window composition.  Round-3 rotation (VERDICT r2 #1): the nine
# slots that were r02-green AND remain locally oracle-replicated every round
# (session_stats, range_join_banded, scalar_funcs, string/math/datetime
# batteries, cube_agg, gen_narrow_sample, gen_wide_sample) rotate out; the
# eight round-2 additions with zero driver evidence rotate in, plus the new
# sim_ann_recall (VERDICT r2 #6).  Driver evidence accumulates across rounds:
# the r01+r02+r03 union covers every registered query.  Everything else
# follows in stable module order and stays covered by
# tests/test_oracle_parity.py every round.
DRIVER_WINDOW: tuple[str, ...] = (
    # dedup (7)
    "dedup_exact",
    "dedup_exact_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_sizes",
    "dedup_simhash_near_dup",
    # similarity (9)
    "sim_knn_bruteforce",
    "sim_embedding_near_dup",
    "sim_near_dup_lsh",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_ivf_kmeans",
    "sim_knn_vectorized",
    "sim_norm_stats",
    "sim_ann_recall",
    # text analysis (11)
    "text_token_stats",
    "text_token_count_bpe",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_word_freq_topk",
    "text_sample_stratified",
    "text_length_histogram",
    "text_quality_filter_pipeline",
    "text_chunk_documents",
    "text_winnow_fingerprints",
    # multimodal (4)
    "mm_extract_features",
    "mm_frame_sample",
    "mm_meta_stats",
    "mm_resize",
    # pandas/Arrow paths (2)
    "token_count_pandas_udf",
    "zscore_per_user",
    # temporal (2) — session_stats / range_join_banded rotated out (r02-green)
    "asof_join",
    "sessionize",
    # function batteries (3 of 8; the rest rotated out r02-green)
    "array_funcs_battery",
    "window_funcs_battery",
    "grouping_sets_agg",
    # SURVEY §2 workload core D1-D10 (10)
    "scan_limit",
    "count_star",
    "filter_eq_string",
    "filter_eq_timestamp",
    "filter_range_conj",
    "filter_between",
    "like_rare",
    "flagship_conjunction",
    "agg_ratio_nullif",
    "agg_coalesce",
    # round-2 pipeline flagships (2)
    "pipeline_curation_funnel",
    "text_contamination_check",
)


def all_queries() -> dict[str, Query]:
    from hands_on_iceberg_compression_spark.operators import (
        advanced,
        dedup,
        functions_battery,
        multimodal,
        pandas_ops,
        similarity,
        temporal,
        textops,
        workload,
    )

    pool: dict[str, Query] = {}
    for mod in (
        workload,
        advanced,
        temporal,
        functions_battery,
        dedup,
        similarity,
        textops,
        multimodal,
        pandas_ops,
    ):
        overlap = pool.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        pool.update(mod.QUERIES)

    missing = set(DRIVER_WINDOW) - pool.keys()
    if missing:
        raise ValueError(f"DRIVER_WINDOW names not registered: {missing}")
    out: dict[str, Query] = {name: pool[name] for name in DRIVER_WINDOW}
    out.update({name: q for name, q in pool.items() if name not in out})
    return out
