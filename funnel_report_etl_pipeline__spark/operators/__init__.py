from funnel_report_etl_pipeline__spark.operators.asof import asof_join
from funnel_report_etl_pipeline__spark.operators.curation import (
    curate_documents,
    curation_summary,
)
from funnel_report_etl_pipeline__spark.operators.dedup import (
    exact_dedup,
    gram_rows,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash,
    simhash_candidate_pairs,
)
from funnel_report_etl_pipeline__spark.operators.funnel import (
    build_funnel_report,
    discovery_totals,
    entity_funnel_metrics,
    fi_status_counts,
    funnel_metrics,
    funnel_summary,
    otp_totals,
    stage_totals,
)
from funnel_report_etl_pipeline__spark.operators.multimodal import (
    binary_meta,
    media_features,
)
from funnel_report_etl_pipeline__spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk_brute,
    cosine_topk_ivf,
    cosine_topk_lsh,
)
from funnel_report_etl_pipeline__spark.operators.text import (
    doc_fingerprint,
    lang_id,
    rolling_fingerprints,
    text_stats,
    token_count_regex,
)

__all__ = [
    # funnel core
    "build_funnel_report",
    "discovery_totals",
    "entity_funnel_metrics",
    "fi_status_counts",
    "funnel_metrics",
    "funnel_summary",
    "otp_totals",
    "stage_totals",
    # relational extensions
    "asof_join",
    # dedup
    "exact_dedup",
    "gram_rows",
    "jaccard_verify",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "simhash",
    "simhash_candidate_pairs",
    # similarity
    "cosine_near_dup_pairs",
    "cosine_topk_brute",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    # text
    "doc_fingerprint",
    "lang_id",
    "rolling_fingerprints",
    "text_stats",
    "token_count_regex",
    # curation / multimodal
    "curate_documents",
    "curation_summary",
    "binary_meta",
    "media_features",
]
