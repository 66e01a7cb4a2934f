"""Structured Streaming surface (SURVEY §2.C C1-C10)."""

from event_streamer_spark.streaming.ops import (
    tumbling_agg,
    sliding_agg,
    session_agg,
    with_watermark,
    stream_dedup,
    stream_exact_dedup,
    stream_decontaminate,
    stream_decontaminate_bloom,
    stream_static_join,
    stream_stream_join,
)
from event_streamer_spark.streaming.dedup import (
    compact_state,
    maybe_compact,
    count_min_batch,
    ddsketch_batch,
    exact_dedup_batch,
    heavy_hitters_batch,
    hll_batch,
    windowed_heavy_hitters_batch,
    minhash_neardup_batch,
    read_count_min,
    read_ddsketch,
    read_heavy_hitters,
    read_windowed_heavy_hitters,
    read_hll,
    kmv_batch,
    read_kmv_distinct,
    read_kmv_overlap,
)
from event_streamer_spark.streaming.drift import (
    census_batch,
    drift_bins_batch,
    read_census,
    read_psi_drift,
)
from event_streamer_spark.streaming.integrity import (
    dup_key_counts_batch,
    fk_monitor_batch,
    prune_healed,
    read_dup_key_audit,
    read_fk_orphans,
)
from event_streamer_spark.streaming.er import (
    er_link_batch,
    read_er_matches,
)
from event_streamer_spark.streaming.dsir import (
    dsir_tokens_batch,
    read_dsir,
)
from event_streamer_spark.streaming.pca import (
    pca_gram_batch,
    read_pca_model,
)
from event_streamer_spark.streaming.basket import (
    pair_mine_batch,
    read_frequent_pairs,
)
from event_streamer_spark.streaming.journey import (
    attribution_batch,
    read_attribution,
)
from event_streamer_spark.streaming.ann import (
    ivf_ingest_batch,
    ivf_probe_cells,
    ivf_query,
)
from event_streamer_spark.streaming.sampling import (
    read_weighted_sample,
    stream_rate_sample,
    weighted_sample_batch,
)
from event_streamer_spark.streaming.state import (
    funnel_with_state,
    markov_with_state,
    running_stats_tws,
    running_stats_with_state,
    sessionize_with_state,
)

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "with_watermark",
    "stream_dedup",
    "stream_exact_dedup",
    "stream_decontaminate",
    "stream_decontaminate_bloom",
    "stream_static_join",
    "stream_stream_join",
    "sessionize_with_state",
    "funnel_with_state",
    "markov_with_state",
    "running_stats_with_state",
    "running_stats_tws",
    "minhash_neardup_batch",
    "exact_dedup_batch",
    "compact_state",
    "maybe_compact",
    "count_min_batch",
    "read_count_min",
    "ddsketch_batch",
    "read_ddsketch",
    "drift_bins_batch",
    "read_psi_drift",
    "census_batch",
    "read_census",
    "dup_key_counts_batch",
    "read_dup_key_audit",
    "fk_monitor_batch",
    "read_fk_orphans",
    "er_link_batch",
    "read_er_matches",
    "dsir_tokens_batch",
    "read_dsir",
    "pca_gram_batch",
    "read_pca_model",
    "pair_mine_batch",
    "read_frequent_pairs",
    "kmv_batch",
    "read_kmv_distinct",
    "read_kmv_overlap",
    "prune_healed",
    "attribution_batch",
    "read_attribution",
    "hll_batch",
    "read_hll",
    "heavy_hitters_batch",
    "read_heavy_hitters",
    "windowed_heavy_hitters_batch",
    "read_windowed_heavy_hitters",
    "ivf_ingest_batch",
    "ivf_probe_cells",
    "ivf_query",
    "weighted_sample_batch",
    "read_weighted_sample",
    "stream_rate_sample",
]
