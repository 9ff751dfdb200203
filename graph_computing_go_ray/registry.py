"""Query registry: every pipeline exposed through the driver contract.

``build_queries()`` returns the full insertion-ordered registry; the
driver-facing ordering (which queries occupy the driver's 50-slot
CORRECTNESS window this round) is applied in ``__ray_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def build_queries() -> dict[str, Callable[[str], Any]]:
    from graph_computing_go_ray.pipelines import corpus as C
    from graph_computing_go_ray.pipelines import dedup as D
    from graph_computing_go_ray.pipelines import graphalgos as G
    from graph_computing_go_ray.pipelines import relational as R
    from graph_computing_go_ray.pipelines import similarity as S
    from graph_computing_go_ray.pipelines import textstats as TX

    # Insertion order here is historical (grouped by domain / round added).
    # The driver-facing window ordering is applied in __ray_entry__.py.
    return {
        # --- round-3 driver window (slots 1-50): the 41 oracle-backed
        # queries CORRECTNESS_r02 never sampled, plus 9 round-3 SQL-oracled
        # queries. Keep this block FIRST — later additions go below the
        # window so the recorded gate covers the never-checked set. ---
        # distributed modularity kernel over the CC partition (SQL-oracled)
        "modularity_components": G.modularity_components,
        # multi-pattern keyword tagging (vectorized count_substring)
        "keyword_tags": TX.keyword_tags,
        # exact 2-hop ball sizes via one bucketed self-join (SQL-oracled)
        "two_hop_sizes_chain": G.two_hop_sizes_chain,
        # A9 Google distance
        "google_distance": R.google_distance_parts,
        # text analysis (training-data ops)
        "token_counts": TX.token_counts,
        # sequence-packing assignment via distributed ordered prefix sum
        "pack_offsets": TX.pack_offsets,
        "quality_scores": TX.quality_scores,
        "fingerprints": TX.fingerprints,
        "lang_id": TX.lang_id,
        # corpus-statistics LM-style quality score (2-pass, join-applied)
        "unigram_logprob": TX.unigram_logprob,
        # dedup suite
        "exact_dedup": D.exact_dedup_keep,
        "ngram_jaccard_pairs": D.ngram_jaccard_pairs,
        # similarity search
        "ann_topk": S.ann_topk,
        "cosine_pairs": S.cosine_pairs,
        # embedding-cosine near-dup dedup (keep = no smaller near-duplicate)
        "embedding_dedup_keep": S.embedding_dedup_keep,
        # gap-based sessionization (streaming-shaped)
        "events_sessionize": R.events_sessionize,
        # ordered conversion funnel: view -> click -> purchase
        "events_funnel": R.events_funnel,
        # as-of join (custom operator Ray Data lacks natively)
        "events_asof_orders": R.events_asof_orders,
        # hopping (sliding) window aggregate
        "events_hopping_window": R.events_hopping_window,
        # range (interval) join: later events of same user within 30 min
        "events_range_pairs": R.events_range_pairs,
        # per-key ordered running aggregate (cumulative window)
        "events_running_total": R.events_running_total,
        # grouped top-k with pre-shuffle partial top-k
        "top_orders_per_segment": R.top_orders_per_segment,
        # shuffle-based anti-join
        "customers_no_orders": R.customers_no_orders,
        # corpus statistics (training-data pipeline layer)
        "hash_sample": C.hash_sample,
        "source_stats": C.source_stats,
        "bpe_pair_counts": C.bpe_pair_counts,
        "token_df": C.token_df,
        "tfidf_top_terms": C.tfidf_top_terms,
        # benchmark decontamination (broadcast shingle membership)
        "benchmark_contamination": C.benchmark_contamination,
        # deterministic stratified per-source sample (content-hash order)
        "stratified_sample": C.stratified_sample,
        # weighted source mixing + hash-shuffle sharding (training output)
        "training_mix": C.training_mix,
        # per-source token-distribution Shannon entropy
        "token_entropy_per_source": C.token_entropy_per_source,
        # exact per-source n_chars quantiles via value histograms
        "chars_quantiles_per_source": C.chars_quantiles_per_source,
        # capstone: quality -> dedup -> near-dup -> decontaminate -> shard
        "curation_pipeline": C.curation_pipeline,
        # within-doc n-gram repetition ratio (quality signal)
        "repetition_scores": TX.repetition_scores,
        # per-doc distinct-bigram diversity ratio (Gopher-style signal)
        "distinct_ngram_ratio": TX.distinct_ngram_ratio,
        # winnowing fingerprint (min-md5 over token windows)
        "winnow_fingerprints": TX.winnow_fingerprints,
        # PMI collocations (pair/unigram joins, never-broadcast vocab)
        "pmi_top_pairs": C.pmi_top_pairs,
        # near-dup clustering: jaccard pairs -> connected components -> keep
        "near_dup_clusters": D.near_dup_clusters,
        # CCNet-style sub-document segment dedup (per-doc retention)
        "segment_dedup": C.segment_dedup,
        # content-hash importance sampling at a per-doc quality rate
        "quality_weighted_sample": C.quality_weighted_sample,
        # bigram-LM conditional probabilities, denominator co-bucketed
        "bigram_lm_top": C.bigram_lm_top,
        # context-window chunking (RAG preprocessing; md5 only, no text)
        "doc_chunks": TX.doc_chunks,
        # exact distributed quantiles (two-pass histogram refinement)
        "price_quantiles": R.price_quantiles,
        # M2 complete: snapshot selection + YearTags forward-fill
        "order_year_snapshot_tags": R.order_year_snapshot_tags,
        # BM25 top-k search over a fixed query set (broadcast query terms,
        # bounded df/stats aggregates, partial top-k before the final pass)
        "bm25_topk": C.bm25_topk,
        # DSIR-style hashed-unigram importance weights (target = lang 'en')
        "dsir_weights": C.dsir_weights,
        # actor-pool batched model inference (weights built once per actor;
        # deterministic scorer => value-checked SQL oracle)
        "quality_classifier": _quality_classifier,
        # repeated-substring coverage (Lee et al. 2022 substring dedup
        # diagnostic): bucketed span-hash count + per-doc interval union
        "dup_span_fraction": TX.dup_span_fraction,
        # the matching REMOVAL transform (keep-first, cut later
        # occurrences); exact-replica pytest, no SQL oracle (r4)
        "dedup_cut_spans": TX.dedup_cut_spans,
        # language-ID confusion matrix vs the labeled lang column
        "lang_confusion": TX.lang_confusion,
        # --- end of the 50-slot driver window ---
        # TPC-H Q8 shape: per-year nation market share in one region
        "market_share": R.market_share,
        # session-length distribution with exact-microsecond durations
        "session_duration_stats": R.session_duration_stats,
        # brand-blocked fuzzy string self-join (vectorized Levenshtein)
        "name_edit_pairs": R.name_edit_pairs,
        # long-to-wide pivot over a fixed column spec
        "orders_priority_pivot": R.orders_priority_pivot,
        # first-order Markov transition matrix of event types per user
        "event_transitions": R.event_transitions,
        # sliding-window distinct: DAU / trailing-7-day WAU / stickiness
        "dau_wau": R.dau_wau,
        # skyline (Pareto frontier): local skyline per block + one fold
        "parts_skyline": R.parts_skyline,
        # year-over-year new / retained / churned customer accounting
        "customer_churn": R.customer_churn,
        # near-dup survivor policy: keep the longest doc per cluster
        "near_dup_keep_longest": D.near_dup_keep_longest,
        # per-doc n-gram novelty (fraction of grams first seen here)
        "novelty_rate": TX.novelty_rate,
        # CUBE(year, priority): all four grouping sets, one scan
        "orders_cube": R.orders_cube,
        # temporal edge persistence: yearly (part, supplier) Jaccard
        "edge_persistence": R.edge_persistence,
        # exact Gini of the in-degree distribution (histogram rank sums)
        "degree_gini": G.degree_gini,
        # PII redaction pass: typed placeholder scrub + per-doc counts
        "pii_scrub": TX.pii_scrub,
        # market-basket association strength of co-occurrence edges
        "cooccur_lift": G.cooccur_lift,
        # TPC-H Q2 shape: grouped argmin with row attribution
        "cheapest_supplier_per_part": R.cheapest_supplier_per_part,
        # TPC-H Q11 shape: per-supplier value vs a global threshold scalar
        "important_suppliers": R.important_suppliers,
        # TPC-H Q14 shape: PROMO revenue share of one month
        "promo_revenue_share": R.promo_revenue_share,
        # per-user z-score outlier profile (explicit-moment variance)
        "events_user_outliers": R.events_user_outliers,
        # inter-event gap power-of-two histogram
        "events_gap_hist": R.events_gap_hist,
        # weekly cohort retention triangle over the events stream
        "cohort_retention": R.cohort_retention,
        # per-user trailing moving average (bounded window frame)
        "events_moving_avg": R.events_moving_avg,
        # TPC-H Q17 shape: decorrelated per-part avg-quantity threshold
        "small_qty_revenue": R.small_qty_revenue,
        # exact 4-cycle census via the co-degree wedge kernel
        "square_count_chain": G.square_count_chain,
        # Newman directed (out,in)-degree assortativity of the chain
        # graph, exact integer moments (SQL-oracled; round 4)
        "chain_degree_assortativity": G.chain_degree_assortativity,
        # per-brand conductance of the co-occurrence partition
        "brand_conductance": G.brand_conductance,
        # CCNet-style perplexity tertile bucketing per source
        "ppl_buckets": TX.ppl_buckets,
        # TPC-H Q3 shape: semi-join + fact-fact join + blockwise top-k
        "shipping_priority": R.shipping_priority,
        # TPC-H Q5 shape: same-nation customer/supplier equality join
        "local_supplier_volume": R.local_supplier_volume,
        # degree-correlation profile knn(k) over the bipartite edge table
        "avg_neighbor_degree": R.avg_neighbor_degree,
        # TPC-H Q4 shape: EXISTS late-lineitem semi-join per priority
        "order_priority_check": R.order_priority_check,
        # TPC-H Q13 shape: order-count distribution incl. the zero bucket
        "customer_order_counts": R.customer_order_counts,
        # TPC-H Q18 shape: HAVING filter on grouped quantity + attribution
        "large_volume_customers": R.large_volume_customers,
        # TPC-H Q15 shape: argmax supplier revenue against a derived view
        "top_supplier": R.top_supplier,
        # TPC-H Q22 shape: global-average balance + anti-join by nation
        "sales_opportunity": R.sales_opportunity,
        # TPC-H Q7 shape: two-nation trade volume per ship year
        "volume_shipping": R.volume_shipping,
        # TPC-H Q10 shape: top-k customers by returned-item revenue
        "returned_items_top": R.returned_items_top,
        # TPC-H Q19 shape: OR-of-ANDs disjunctive predicate revenue
        "disjunctive_revenue": R.disjunctive_revenue,
        # recency-weighted engagement: exp-decay sum per user
        "events_decay_engagement": R.events_decay_engagement,
        # per-customer order inter-arrival gaps (telescoping mean, max gap)
        "orders_interarrival_stats": R.orders_interarrival_stats,
        # per-nation supplier-revenue vs customer-spend balance
        "nation_trade_balance": R.nation_trade_balance,
        # per-brand year-over-year revenue growth ratios
        "brand_yoy_growth": R.brand_yoy_growth,
        # per-source percent_rank window filter via value histograms
        "chars_percentile_filter": C.chars_percentile_filter,
        # JSON props extraction (one vectorized Arrow regex pass) + agg
        "events_props_stats": R.events_props_stats,
        # supply-chain rollup: revenue per supplier region (Q5 flavor)
        "supplier_region_revenue": R.supplier_region_revenue,
        # leave-one-out 1-NN label consistency of the embedding space
        "knn_label_accuracy": S.knn_label_accuracy,
        # winnow-fingerprint equi-join near-dup candidate pairs
        "winnow_dup_pairs": TX.winnow_dup_pairs,
        # mean log2 P(b|a) per doc under corpus bigram counts
        "bigram_logprob": TX.bigram_logprob,
        # Gopher-style quality rule outcomes + composite keep flag
        "gopher_rules": TX.gopher_rules,
        # SALSA hub/authority (Lempel-Moran closed form: degrees +
        # bipartite-support CC, zero per-iteration shuffles; union-find +
        # lazy-power-iteration parity in tests/test_graph_extras.py)
        "salsa_supplier_part": G.salsa_supplier_part,
        # bipartite butterfly (2x2-biclique) census: wedges through orders
        # -> bucketed co-degree sum -> C(w,2) moment partials
        "butterfly_count": G.butterfly_count,
        # rich-club ladder phi(k) over the sparse chain graph (degree joins
        # + per-k integer partials)
        "rich_club": G.rich_club,
        # Newman nominal assortativity by p_brand, exact-integer form
        "brand_assortativity": G.brand_assortativity,
        # per-source type-token ratio + hapax fraction (exact distinct via
        # one (source, token) bucketed exchange)
        "lexical_richness": C.lexical_richness,
        # per-year graph densification: edges, active/new vertices (one
        # pass, no per-year rescan)
        "graph_growth": G.graph_growth,
        # pairwise cross-source shingle-set overlap (contamination audit;
        # one gram-hash-bucketed exchange)
        "source_overlap": C.source_overlap,
        # continuous-MLE power-law exponent of the in-degree tail
        "degree_powerlaw_alpha": G.degree_powerlaw_alpha,
        # near-dup cluster-size histogram (dedup audit over the pair graph)
        "dup_cluster_sizes": D.dup_cluster_sizes,
        # eigenvector centrality: HITS over the symmetrized edge set (no
        # SQL oracle — iterative; numpy power-iteration parity in
        # tests/test_graph_extras.py)
        "eigenvector_cooccur": G.eigenvector_cooccur,
        # multimodal actor-pool stages over an opaque-binary media table
        # (deterministic stub codec; exact-replica oracle in
        # tests/test_multimodal.py; rows/schema check here)
        "media_features": _media_features,
        "media_frame_stats": _media_frame_stats,
        # --- round-3 rows-only surfaces (each pytest-verified; past the
        # 50-slot window, covered by this session's full replica sweep) ---
        # K11b: OpenAlex sub-discipline multilayer KQI (python-replica
        # pytest oracle in tests/test_subdiscipline.py; rows-only here)
        "sub_discipline_entropy": _sub_discipline_entropy,
        # citation-generation depth: longest backward-reference chain per
        # work via the striped DAG wavefront (DP-replica pytest in
        # tests/test_graph_extras.py; rows-only here)
        "citation_depth": _citation_depth,
        # Common-Crawl-style host-level webgraph collapse (replica pytest
        # in tests/test_linkgraph_build.py; rows-only here)
        "host_graph": _host_graph,
        # host-authority weighted PageRank over the host webgraph
        # (numpy-parity pytest; rows-only)
        "host_pagerank": _host_pagerank,
        # TrustRank + relative spam mass seeded at top-authority hosts
        # (numpy-parity pytest; rows-only)
        "host_trustrank": _host_trustrank,
        # propose/accept maximal matching (python-replica pytest; rows-only)
        "matching_cooccur": G.matching_cooccur,
        # multilevel coarsening round: matching -> contraction (replica
        # pytest; rows-only)
        "coarsen_cooccur": G.coarsen_cooccur,
        # Boruvka minimum spanning forest (Kruskal-parity pytest; rows-only)
        "msf_chain": G.msf_chain,
        # single-pass centroid quantile sketch (accuracy pytest; rows-only)
        "approx_price_quantiles": R.approx_price_quantiles,
        # HLL-per-hopping-window distinct users (accuracy pytest; rows-only)
        "approx_window_users": R.approx_window_users,
        # --- already driver-verified green in CORRECTNESS_r02 ---
        # degrees / histograms / dedup (SURVEY §2.5 A1-A2, §2.7 D6)
        "in_degree": R.in_degree,
        "out_degree": R.out_degree,
        "degree_histogram": R.degree_histogram,
        "distinct_edges": R.distinct_edges,
        # rank / percent slice (T2/T3)
        "top_in_degree": R.top_in_degree,
        "percent_slice_top20": R.percent_slice_top20,
        # joins / shrink (J4-J5, A3)
        "semi_join_shrink": R.semi_join_shrink,
        # same semantics via Bloom prefilter + exact join on survivors —
        # the fact-scale keep-set strategy (engine/bloom.py)
        "bloom_semi_join_shrink": R.bloom_semi_join_shrink,
        "orders_by_nation": R.orders_by_nation,
        "hash_join_orders_customer": R.hash_join_orders_customer,
        # grouped aggregation (A1-at-scale combiner pattern)
        "pricing_summary": R.pricing_summary,
        # hierarchical subtotals: one distributed scan at the finest level,
        # coarser levels re-aggregated from the tiny result
        "orders_rollup": R.orders_rollup,
        # M1 string-ts parse + cutoff-year filter
        "orders_ts_filter": R.orders_ts_filter,
        # M2 yearly snapshot selection
        "order_year_snapshot": R.order_year_snapshot,
        # entropies (A4/A5 + north-rule link entropy)
        "link_entropy_per_vertex": R.link_entropy_per_vertex,
        "entropy_report": R.entropy_report,
        # co-occurrence pair generation (A9/triangle primitive)
        "cooccur_edges": R.cooccur_edges,
        # windowed aggregate over the event stream
        "events_daily_user": R.events_daily_user,
        # [north-rule] iterative graph algorithms (SURVEY §2.10); PageRank /
        # CC / LPA have pytest numpy-oracle goldens (tests/test_superstep.py),
        # triangles has a SQL oracle
        "triangle_count": G.triangles_cooccur,
        "pagerank_bipartite": G.pagerank_bipartite,
        "connected_components": G.components_cooccur,
        "label_propagation": G.labelprop_cooccur,
        # synchronous Louvain local-move communities (exact-parity replica
        # pytest in tests/test_louvain.py; modularity itself is SQL-checked
        # via modularity_components)
        "louvain_cooccur": G.louvain_cooccur,
        # DOULION sampled triangle estimate (deterministic edge subsample;
        # exact-parity + accuracy pytest in tests/test_sampled_triangles.py)
        "triangles_sampled": G.triangles_sampled,
        # multilevel Louvain: move -> contract -> move -> project (exact
        # weighted-replica parity in tests/test_louvain.py)
        "louvain_chain_two_level": G.louvain_chain_two_level,
        "component_sizes": G.component_sizes,
        "coreness": G.coreness_cooccur,
        # HITS / personalized PageRank / HyperBall (numpy + exact-BFS
        # oracles in tests/test_graph_extras.py)
        "hits_bipartite": G.hits_bipartite,
        "ppr_bipartite": G.ppr_bipartite,
        "hyperball_cooccur": G.hyperball_cooccur,
        # harmonic centrality from the HyperBall lineage (exact-BFS pytest)
        "harmonic_cooccur": G.harmonic_cooccur,
        "bfs_cooccur": G.bfs_cooccur,
        # double-sweep diameter lower bound (python-BFS parity pytest)
        "diameter_2sweep": G.diameter_2sweep,
        # strongly connected components by FW/BW min-label peeling
        # (iterative Tarjan-parity pytest oracle in tests/test_graph_extras.py)
        "scc_chain": G.scc_chain,
        # web-link-graph symmetry metric + graph coarsening (SQL oracles)
        "chain_reciprocity": G.chain_reciprocity,
        "collapse_nation_brand": G.collapse_nation_brand,
        # DeepWalk-style deterministic walks + skip-gram pair extraction
        # (exact single-process parity oracles in tests/test_graph_extras.py)
        "random_walks_chain": G.random_walks_chain,
        "skipgram_pairs_chain": G.skipgram_pairs_chain,
        # second-order (p,q)-biased walks, integer-exact choice
        "node2vec_walks_chain": G.node2vec_walks_chain,
        # graph-metric scalars + link-prediction scores (SQL oracles)
        "global_clustering": G.global_clustering,
        "degree_assortativity": G.degree_assortativity,
        "adamic_adar_topk": G.adamic_adar_topk,
        # Jaccard edge similarity (common-neighbor kernel + degree joins)
        "jaccard_topk": G.jaccard_topk,
        # per-vertex local clustering coefficient from CN edge supports
        "local_clustering": G.local_clustering_per_vertex,
        # k-truss support peeling (python peeling-replica pytest oracle)
        "ktruss_cooccur": G.ktruss_cooccur,
        # Katz centrality, contractive alpha auto-derived (numpy pytest oracle)
        "katz_bipartite": G.katz_bipartite,
        # sampled-source Brandes betweenness (python-Brandes pytest oracle)
        "betweenness_chain": G.betweenness_chain,
        # weighted PageRank, w = l_quantity (numpy-replica pytest oracle)
        "weighted_pagerank": G.weighted_pagerank_bipartite,
        # Luby maximal independent set (exact python-replica pytest oracle)
        "mis_cooccur": G.mis_cooccur,
        # Jones-Plassmann greedy coloring (exact python-replica pytest)
        "coloring_chain": G.coloring_chain,
        # weighted shortest paths, frontier Bellman-Ford (Dijkstra pytest)
        "sssp_chain": G.sssp_chain,
        # percolation robustness: hash-drop p of edges -> giant CC size
        "robustness_curve": G.robustness_curve,
        # Zipf rank-frequency slope of the corpus vocabulary
        "zipf_slope": C.zipf_slope,
        # distributed Lloyd's k-means (iterative; numpy-replica pytest oracle)
        "kmeans_embeddings": S.kmeans_embeddings,
        # SemDeDup: within-kmeans-cluster cosine prune (rows-only; iterative)
        "semdedup_keep": S.semdedup_keep,
        # distributed PCA via moment partials (numpy-replica pytest oracle)
        "pca_embeddings": S.pca_embeddings,
        "rolling_fingerprints": TX.rolling_fingerprints,
        # count-min heavy hitters (accuracy asserted in pytest)
        "approx_top_tokens": TX.approx_top_tokens,
        "minhash_lsh_pairs": D.minhash_lsh_pairs,
        "simhash_pairs": D.simhash_pairs,
        "lsh_cosine_pairs": S.lsh_cosine_pairs,
        "ivf_topk": S.ivf_topk,
        # product-quantization ANN + exact re-rank (recall vs brute in
        # pytest; returned sims are exact)
        "pq_topk": S.pq_topk,
        # Matryoshka truncated-dim recall@k curve (full-dim row == 1.0,
        # exact-replica pytest)
        "truncation_recall": S.truncation_recall,
        # Davies-Bouldin clustering quality (exact from one streaming
        # pass; numpy-replica pytest)
        "kmeans_db_index": S.kmeans_db_index,
        # MMR diversified top-k re-ranking (distributed candidate stage +
        # greedy on the candidate pool; numpy-replica pytest)
        "mmr_topk": S.mmr_topk,
        # greedy k-center (farthest-point) coreset selection, one
        # distributed pass per round (numpy-replica pytest)
        "kcenter_coreset": S.kcenter_coreset,
        # simplified silhouette per k-means cluster (numpy-replica pytest)
        "silhouette_kmeans": S.silhouette_kmeans,
        # first-fit-decreasing sequence packing per hash shard (exact
        # FFD parity pytest; no SQL form)
        "pack_bins_ffd": TX.pack_bins_ffd,
        # HyperLogLog approximate distinct (accuracy asserted in pytest)
        "approx_distinct_parts": R.approx_distinct_parts,
        # iterative BPE merge training (pytest oracle: python replica)
        "bpe_train": C.bpe_train,
        # tokenizer application: per-doc raw vs BPE token counts
        "bpe_apply": C.bpe_apply,
        # --- round-3 session-2 additions (below the driver window;
        # verified by the repo's own driver-replica sweep) ---
        # TPC-H Q6-shape one-pass filter+sum revenue forecast (SQL oracle)
        "simple_filter_revenue": R.simple_filter_revenue,
        # TPC-H Q9-shape profit by supplier nation x ship year (SQL oracle)
        "profit_by_nation_year": R.profit_by_nation_year,
        # TPC-H Q16-shape distinct-supplier count per part class (SQL oracle)
        "supplier_cnt_by_part": R.supplier_cnt_by_part,
        # TPC-H Q20-shape excess-stock supplier selection (SQL oracle)
        "excess_suppliers": R.excess_suppliers,
        # TPC-H Q21-shape unique-latest-shipper blame count (SQL oracle)
        "last_shipper_blame": R.last_shipper_blame,
        # first-touch session attribution of purchase value (SQL oracle)
        "attribution_revenue": R.attribution_revenue,
        # per-type daily count z-score anomalies (SQL oracle)
        "event_daily_anomaly": R.event_daily_anomaly,
        # Flesch-style readability signals per document (SQL oracle)
        "readability_scores": TX.readability_scores,
        # embeddedness-0 edges of the co-occurrence graph (SQL oracle)
        "local_bridges": G.local_bridges,
        # chars-per-token fertility proxy by language (SQL oracle)
        "lang_fertility": TX.lang_fertility,
        # signup→purchase conversion lag per weekly cohort (SQL oracle)
        "time_to_conversion": R.time_to_conversion,
        # watermark late-arrival audit via distributed prefix-max (SQL
        # oracle)
        "late_events": R.late_events,
        # pairwise L2 between per-label embedding centroids (SQL oracle)
        "label_centroid_dists": S.label_centroid_dists,
        # RFM quintile segmentation via exact-quantile boundaries (SQL
        # oracle)
        "rfm_segments": R.rfm_segments,
        # ordered string-agg signature histogram, top-k (SQL oracle)
        "returnflag_sequences": R.returnflag_sequences,
        # top in-session event-type trigrams (SQL oracle)
        "session_trigrams": R.session_trigrams,
        # per-type OLS daily-count trend, exact integer moments (SQL
        # oracle)
        "daily_trend": R.daily_trend,
        # ratio-to-report: nation share of region revenue (SQL oracle)
        "nation_share_of_region": R.nation_share_of_region,
        # transductive kNN label spreading accuracy (exact-replica pytest;
        # iterative, no SQL form)
        "knn_label_spread": S.knn_label_spread,
        # chi-square bursty terms across sources (SQL oracle)
        "term_burstiness": C.term_burstiness,
        # peak session concurrency via distributed interval sweep (SQL
        # oracle)
        "peak_concurrent_sessions": R.peak_concurrent_sessions,
        # Spearman rank stability of part in-degree across years (SQL
        # oracle)
        "yearly_rank_stability": R.yearly_rank_stability,
        # same-customer orders within 7 days: self theta-join count (SQL
        # oracle)
        "repeat_orders_7d": R.repeat_orders_7d,
        # shortest-path extraction via parent pointers + shard reads
        # (contract pytest; iterative, no SQL form)
        "sssp_path_chain": G.sssp_path_chain,
        # Pearson corr of JSON prop k vs value, exact moments (SQL oracle)
        "props_value_corr": R.props_value_corr,
        # quantity-weighted exact price quantiles (SQL oracle)
        "weighted_price_quantiles": R.weighted_price_quantiles,
        # upsert compaction: latest event per (user, type) (SQL oracle)
        "latest_event_per_user_type": R.latest_event_per_user_type,
        # tumbling daily OHLC of event values (SQL oracle)
        "daily_ohlc": R.daily_ohlc,
        # histogram of per-user event-mix entropies (SQL oracle)
        "user_event_entropy_hist": R.user_event_entropy_hist,
        # robust mean via exact-quantile winsorization (SQL oracle)
        "winsorized_value_mean": R.winsorized_value_mean,
        # bitmap-style cohort set algebra (SQL oracle)
        "segment_users_abc": R.segment_users_abc,
        # frontier-adaptive residual-push PageRank (replica + power-iter
        # agreement pytest; iterative, no SQL form)
        "delta_pagerank_bipartite": G.delta_pagerank_bipartite,
        # entropy rate of the PR-stationary walk (numpy-replica pytest)
        "walk_entropy_rate": G.walk_entropy_rate,
        # cross-source bigram-LM cross-entropy matrix (SQL oracle)
        "source_lm_divergence": C.source_lm_divergence,
        # Broder bow-tie decomposition CORE/IN/OUT/OTHER (python-replica
        # pytest; iterative, no SQL form)
        "bowtie_chain": G.bowtie_chain,
        # deterministic content-hash train/val/test split report (SQL
        # oracle)
        "train_val_test_split": C.train_val_test_split,
        # Benford first-digit audit of order totals (SQL oracle)
        "benford_price": R.benford_price,
        # grouped stddev from exact integer moments (SQL oracle)
        "price_dispersion_by_type": R.price_dispersion_by_type,
        # chained exact quantiles: median absolute deviation (SQL oracle)
        "price_mad": R.price_mad,
        # char-class composition audit per source (SQL oracle)
        "charclass_profile": TX.charclass_profile,
        # hour-of-day seasonality per event type (SQL oracle)
        "hourly_profile": R.hourly_profile,
        # order-to-last-ship fulfillment lag histogram (SQL oracle)
        "order_fulfillment_hist": R.order_fulfillment_hist,
        # Welch two-sample t from exact integer moments (SQL oracle)
        "weekend_value_ttest": R.weekend_value_ttest,
        # per-source exact-duplicate rate, hash-only shuffle (SQL oracle)
        "source_dedup_rate": TX.source_dedup_rate,
        # 1-WL color refinement fingerprint (exact numpy-replica pytest)
        "wl_colors_cooccur": G.wl_colors_cooccur,
        # random-walk hitting times, fixed-round Jacobi (replica +
        # exact-linear-solve pytest)
        "hitting_time_cooccur": G.hitting_time_cooccur,
    }


def _quality_classifier(sf_dir: str):
    from graph_computing_go_ray.stages.scoring import quality_classifier_scores

    return quality_classifier_scores(sf_dir)


def _media_features(sf_dir: str):
    from graph_computing_go_ray.stages.multimodal import media_features

    return media_features(sf_dir)


def _media_frame_stats(sf_dir: str):
    from graph_computing_go_ray.stages.multimodal import media_frame_stats

    return media_frame_stats(sf_dir)


def _host_graph(sf_dir: str):
    """Host-level webgraph (src_host, dst_host, n_links) over the
    deterministic synthetic page fixture: generate → extract → resolve →
    collapse to host granularity (pipelines/pages.py host_edges).
    Generation and build are cached per work root; exact python-replica
    pytest in tests/test_linkgraph_build.py; rows/schema check here."""
    import hashlib
    import os

    from graph_computing_go_ray.pipelines.pages import (
        build_link_graph,
        host_edges,
    )
    from graph_computing_go_ray.sources.pages_gen import generate_pages

    root = os.environ.get("GCGR_WORK_ROOT", "/tmp/gcgr_work")
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(root, f"hostgraph-{key}")
    pages_dir = generate_pages(os.path.join(base, "pages"), n_pages=4000,
                               seed=42, n_files=8)
    paths = build_link_graph(pages_dir, os.path.join(base, "graph"),
                             num_buckets=8)
    return host_edges(paths, num_buckets=8)


def _host_pagerank(sf_dir: str):
    """Host-authority ranking over the same cached page fixture as
    _host_graph (build cached; the PageRank workdir lives beside it)."""
    import hashlib
    import os

    from graph_computing_go_ray.pipelines.pages import (
        build_link_graph,
        host_pagerank,
    )
    from graph_computing_go_ray.sources.pages_gen import generate_pages

    root = os.environ.get("GCGR_WORK_ROOT", "/tmp/gcgr_work")
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(root, f"hostgraph-{key}")
    pages_dir = generate_pages(os.path.join(base, "pages"), n_pages=4000,
                               seed=42, n_files=8)
    paths = build_link_graph(pages_dir, os.path.join(base, "graph"),
                             num_buckets=8)
    return host_pagerank(paths, os.path.join(base, "hpr"), num_buckets=8)


def _host_trustrank(sf_dir: str):
    """TrustRank + spam mass over the same cached page fixture as
    _host_graph (pipelines/pages.py host_trustrank; numpy replica pytest
    in tests/test_graph_extras.py + seed/mass invariants in
    tests/test_linkgraph_build.py)."""
    import hashlib
    import os

    from graph_computing_go_ray.pipelines.pages import (
        build_link_graph,
        host_trustrank,
    )
    from graph_computing_go_ray.sources.pages_gen import generate_pages

    root = os.environ.get("GCGR_WORK_ROOT", "/tmp/gcgr_work")
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(root, f"hostgraph-{key}")
    pages_dir = generate_pages(os.path.join(base, "pages"), n_pages=4000,
                               seed=42, n_files=8)
    paths = build_link_graph(pages_dir, os.path.join(base, "graph"),
                             num_buckets=8)
    return host_trustrank(paths, os.path.join(base, "htr"), num_buckets=8)


def _sub_discipline_entropy(sf_dir: str):
    from graph_computing_go_ray.pipelines.citations import (
        sub_discipline_entropy_query,
    )

    return sub_discipline_entropy_query(sf_dir)


def _citation_depth(sf_dir: str):
    from graph_computing_go_ray.pipelines.citations import citation_depth

    return citation_depth(sf_dir)
