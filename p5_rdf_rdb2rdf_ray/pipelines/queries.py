"""Driver-facing query registry: one Ray pipeline + one DuckDB oracle per
implemented operator (SURVEY §2 checklist → CORRECTNESS_r{N}.json).

Every builder takes ``sf_dir`` and returns a lazy ``ray.data.Dataset``;
``ORACLES[name]`` is the DuckDB SQL producing identical rows (same column
names!) over the pre-registered parquet views. Entries without an oracle
(non-SQL-expressible: LSH internals, SimHash, language-ID heuristics) get
the driver's rows-only check.

Builders and their SQL twins live in ``queries_kg`` (RDB2RDF core),
``queries_rel`` (relational analytics) and ``queries_data``
(training-data extras); this module only assembles the registry dicts.
ORDERING CONTRACT: every oracled entry precedes every rows-only entry —
the round-3 driver stopped after 50 of 60 entries, so the strongest
checks must come first.
"""

from __future__ import annotations

from .queries_kg import *  # noqa: F401,F403
from .queries_rel import *  # noqa: F401,F403
from .queries_data import *  # noqa: F401,F403

QUERIES = {
    "dm_nation": q_dm_nation,
    "dm_events": q_dm_events,
    "r2rml_orders": q_r2rml_orders,
    "r2rml_sqlquery": q_r2rml_sqlquery,
    "r2rml_inverse_lookup": q_r2rml_inverse_lookup,
    "r2rml_turtle_graph": q_r2rml_turtle_graph,
    "lookup_nation": q_lookup_nation,
    "lookup_nation_by_value": q_lookup_nation_by_value,
    "bgp_nation_region": q_bgp_nation_region,
    "bgp_topk": q_bgp_topk,
    "bgp_filter": q_bgp_filter,
    "bgp_store": q_bgp_store,
    "bgp_optional": q_bgp_optional,
    "bgp_union": q_bgp_union,
    "bgp_minus": q_bgp_minus,
    "bgp_construct": q_bgp_construct,
    "bgp_values": q_bgp_values,
    "bgp_bind": q_bgp_bind,
    "bgp_aggregate": q_bgp_aggregate,
    "store_contexts": q_store_contexts,
    "count_statements": q_count_statements,
    "q1_pricing": q_q1_pricing,
    "top10_orders": q_top10_orders,
    "purchase_events": q_purchase_events,
    "brand_stats": q_brand_stats,
    "segment_orders": q_segment_orders,
    "distinct_event_types": q_distinct_event_types,
    "dedup_exact_docs": q_dedup_exact_docs,
    "token_counts_docs": q_token_counts_docs,
    "quality_docs": q_quality_docs,
    "fingerprint_docs": q_fingerprint_docs,
    "user_sessions": q_user_sessions,
    "window_events": q_window_events,
    "hopping_window_events": q_hopping_window_events,
    "ngram_counts_docs": q_ngram_counts_docs,
    "tfidf_docs": q_tfidf_docs,
    "chunk_docs": q_chunk_docs,
    "quantiles_docs": q_quantiles_docs,
    "approx_quantiles_docs": q_approx_quantiles_docs,
    "join_orders_customer": q_join_orders_customer,
    "anti_join_customers": q_anti_join_customers,
    "graph_diff_events": q_graph_diff_events,
    "path_reach_docs": q_path_reach_docs,
    "asof_events_orders": q_asof_events_orders,
    "range_join_orders": q_range_join_orders,
    "jaccard_pairs_docs": q_jaccard_pairs_docs,
    "minhash_pairs_docs": q_minhash_pairs_docs,
    "near_dedup_docs": q_near_dedup_docs,
    "clean_corpus_docs": q_clean_corpus_docs,
    "decontaminate_docs": q_decontaminate_docs,
    "emb_near_dedup": q_emb_near_dedup,
    "repetition_docs": q_repetition_docs,
    "sample_docs": q_sample_docs,
    "stratified_sample_docs": q_stratified_sample_docs,
    "mix_docs_sources": q_mix_docs_sources,
    "ann_topk": q_ann_topk,
    "neardup_embeddings": q_neardup_embeddings,
    "multimodal_features": q_multimodal_features,
    # --- rows-only tail (no SQL-expressible oracle) ---
    "winnow_fp_docs": q_winnow_fp_docs,
    "approx_vocab_docs": q_approx_vocab_docs,
    "pack_chunks_docs": q_pack_chunks_docs,
    "langid_docs": q_langid_docs,
    "simhash_pairs_docs": q_simhash_pairs_docs,
    "lsh_topk": q_lsh_topk,
    "ivf_topk": q_ivf_topk,
    "neardup_embeddings_approx": q_neardup_embeddings_approx,
}

ORACLES = {
    "dm_nation": SQL_DM_NATION,
    "dm_events": SQL_DM_EVENTS,
    "r2rml_orders": SQL_R2RML_ORDERS,
    "r2rml_sqlquery": SQL_R2RML_SQLQUERY,
    "r2rml_inverse_lookup": SQL_R2RML_INVERSE_LOOKUP,
    "r2rml_turtle_graph": SQL_R2RML_TURTLE_GRAPH,
    "lookup_nation": SQL_LOOKUP_NATION,
    "lookup_nation_by_value": SQL_LOOKUP_NATION_BY_VALUE,
    "bgp_nation_region": SQL_BGP_NATION_REGION,
    "bgp_topk": SQL_BGP_TOPK,
    "bgp_filter": SQL_BGP_FILTER,
    "bgp_store": SQL_BGP_NATION_REGION,
    "bgp_optional": SQL_BGP_OPTIONAL,
    "bgp_union": SQL_BGP_UNION,
    "bgp_minus": SQL_BGP_MINUS,
    "bgp_construct": SQL_BGP_CONSTRUCT,
    "bgp_values": SQL_BGP_VALUES,
    "bgp_bind": SQL_BGP_BIND,
    "bgp_aggregate": SQL_BGP_AGGREGATE,
    "store_contexts": SQL_STORE_CONTEXTS,
    "count_statements": SQL_COUNT_STATEMENTS,
    "q1_pricing": SQL_Q1,
    "top10_orders": SQL_TOP10_ORDERS,
    "purchase_events": SQL_PURCHASE_EVENTS,
    "brand_stats": SQL_BRAND_STATS,
    "segment_orders": SQL_SEGMENT_ORDERS,
    "distinct_event_types": SQL_DISTINCT_EVENT_TYPES,
    "dedup_exact_docs": SQL_DEDUP_EXACT_DOCS,
    "token_counts_docs": SQL_TOKEN_COUNTS_DOCS,
    "quality_docs": SQL_QUALITY_DOCS,
    "fingerprint_docs": SQL_FINGERPRINT_DOCS,
    "user_sessions": SQL_USER_SESSIONS,
    "window_events": SQL_WINDOW_EVENTS,
    "hopping_window_events": SQL_HOPPING_WINDOW_EVENTS,
    "ngram_counts_docs": SQL_NGRAM_COUNTS_DOCS,
    "tfidf_docs": SQL_TFIDF_DOCS,
    "chunk_docs": SQL_CHUNK_DOCS,
    "quantiles_docs": SQL_QUANTILES_DOCS,
    "approx_quantiles_docs": SQL_APPROX_QUANTILES_DOCS,
    "join_orders_customer": SQL_JOIN_ORDERS_CUSTOMER,
    "anti_join_customers": SQL_ANTI_JOIN_CUSTOMERS,
    "graph_diff_events": SQL_GRAPH_DIFF_EVENTS,
    "path_reach_docs": SQL_PATH_REACH_DOCS,
    "asof_events_orders": SQL_ASOF_EVENTS_ORDERS,
    "range_join_orders": SQL_RANGE_JOIN_ORDERS,
    "jaccard_pairs_docs": SQL_JACCARD_PAIRS_DOCS,
    "minhash_pairs_docs": SQL_MINHASH_PAIRS_DOCS,
    "near_dedup_docs": SQL_NEAR_DEDUP_DOCS,
    "clean_corpus_docs": SQL_CLEAN_CORPUS_DOCS,
    "decontaminate_docs": SQL_DECONTAMINATE_DOCS,
    "emb_near_dedup": SQL_EMB_NEAR_DEDUP,
    "repetition_docs": SQL_REPETITION_DOCS,
    "sample_docs": SQL_SAMPLE_DOCS,
    "stratified_sample_docs": SQL_STRATIFIED_SAMPLE_DOCS,
    "mix_docs_sources": SQL_MIX_DOCS_SOURCES,
    "ann_topk": SQL_ANN_TOPK,
    "neardup_embeddings": SQL_NEARDUP_EMBEDDINGS,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    # langid_docs / simhash_pairs_docs / lsh_topk / winnow_fp_docs /
    # approx_vocab_docs / pack_chunks_docs / ivf_topk /
    # neardup_embeddings_approx: rows-only
}
