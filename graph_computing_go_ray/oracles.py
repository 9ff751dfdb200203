"""DuckDB oracle SQL for every SQL-expressible query in the registry.

Each entry is the ANSI-SQL equivalent of the same-named ``registry``
pipeline, runnable by DuckDB over the driver's pre-registered parquet
views (region nation customer supplier part orders lineitem events
documents embeddings). Column names/order match the Ray output exactly
(the driver hashes values after sorting columns by name).
"""

from __future__ import annotations


_BIGRAM_LL_ORACLE = (
    "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
    "  '[a-z0-9]+') AS ws FROM documents), "
    "pairs AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] "
    "  for i in generate_series(1, greatest(len(ws) - 1, 0))]) AS ab "
    "  FROM toks), "
    "pc_ AS (SELECT ab, count(*) AS c FROM pairs GROUP BY ab), "
    "ac AS (SELECT split_part(ab, ' ', 1) AS a, sum(c) AS ca "
    "  FROM pc_ GROUP BY 1) "
    "SELECT p.doc_id, round(avg(log2(pc_.c * 1.0 / ac.ca)), 6) "
    "AS logprob FROM pairs p JOIN pc_ USING (ab) "
    "JOIN ac ON split_part(p.ab, ' ', 1) = ac.a GROUP BY p.doc_id"
)


def _lang_id_oracle() -> str:
    """lang_id oracle built from the SAME marker sets the pipeline uses
    (functions/text.py LANG_MARKERS): per-doc marker-token counts, argmax
    with ties broken by the fixed en>de>fr>es order, 'und' when all zero."""
    from graph_computing_go_ray.functions.text import LANG_MARKERS

    def inlist(ws: frozenset) -> str:
        return ", ".join(f"'{w}'" for w in sorted(ws))

    return (
        "WITH toks AS ("
        "  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w"
        "  FROM documents"
        "), scores AS ("
        "  SELECT doc_id, "
        f"    COUNT(*) FILTER (w IN ({inlist(LANG_MARKERS['en'])})) AS s_en, "
        f"    COUNT(*) FILTER (w IN ({inlist(LANG_MARKERS['de'])})) AS s_de, "
        f"    COUNT(*) FILTER (w IN ({inlist(LANG_MARKERS['fr'])})) AS s_fr, "
        f"    COUNT(*) FILTER (w IN ({inlist(LANG_MARKERS['es'])})) AS s_es "
        "  FROM toks GROUP BY doc_id"
        ") "
        "SELECT d.doc_id, CASE "
        "  WHEN GREATEST(COALESCE(s_en,0), COALESCE(s_de,0), COALESCE(s_fr,0),"
        "                COALESCE(s_es,0)) = 0 THEN 'und' "
        "  WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
        "  WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' "
        "  WHEN s_fr >= s_es THEN 'fr' "
        "  ELSE 'es' END AS lang_pred "
        "FROM documents d LEFT JOIN scores USING (doc_id)"
    )


_NEARDUP_LAB_CTE = (
    "WITH RECURSIVE toks AS (SELECT doc_id, regexp_extract_all("
    "  lower(text), '[a-z0-9]+') AS ws FROM documents), "
    "grams AS (SELECT DISTINCT doc_id, unnest([ws[i] || ' ' || ws[i+1] "
    "  || ' ' || ws[i+2] for i in generate_series(1, "
    "  greatest(len(ws) - 2, 0))]) AS g FROM toks), "
    "sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1), "
    "inter AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i "
    "  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id "
    "  GROUP BY 1, 2), "
    "p AS (SELECT u, v FROM inter "
    "  JOIN sz sa ON u = sa.doc_id JOIN sz sb ON v = sb.doc_id "
    "  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.2), "
    "e AS (SELECT u AS a, v AS b FROM p UNION SELECT v, u FROM p), "
    "reach AS (SELECT a, b FROM e "
    "  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a), "
    "lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id "
    "  FROM reach GROUP BY a) "
)




def build_oracles() -> dict[str, str]:
    return {
        # Gini from the degree histogram, integer rank sums per run
        "degree_gini": (
            "WITH d AS (SELECT l_partkey AS dst, count(*) AS deg "
            "  FROM lineitem GROUP BY l_partkey), "
            "h AS (SELECT deg, count(*) AS c FROM d GROUP BY deg), "
            "o AS (SELECT deg, c, 1 + COALESCE(SUM(c) OVER ("
            "  ORDER BY deg ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "  1 PRECEDING), 0) AS strt FROM h), "
            "t AS (SELECT SUM(deg * (c * (2 * strt + c - 1) // 2)) AS t, "
            "  SUM(deg * c) AS s, SUM(c) AS n FROM o) "
            "SELECT CAST(n AS BIGINT) AS n_vertices, "
            "CAST(s AS BIGINT) AS sum_degree, "
            "round(2.0 * t / (n * s) - (n + 1) * 1.0 / n, 6) AS gini FROM t"
        ),
        # persistence: self-join of the yearly distinct edge sets
        "edge_persistence": (
            "WITH e AS (SELECT DISTINCT EXTRACT(year FROM l_shipdate) AS y, "
            "  l_partkey AS p, l_suppkey AS s FROM lineitem), "
            "n AS (SELECT y, count(*) AS n_edges FROM e GROUP BY y), "
            "pers AS (SELECT a.y, count(*) AS n_persist FROM e a "
            "  JOIN e b ON b.p = a.p AND b.s = a.s AND b.y = a.y + 1 "
            "  GROUP BY a.y) "
            "SELECT n.y AS year, n.n_edges, "
            "CAST(COALESCE(p.n_persist, 0) AS BIGINT) AS n_persist, "
            "round(COALESCE(p.n_persist, 0) * 1.0 / "
            "  GREATEST(n.n_edges + COALESCE(n2.n_edges, 0) "
            "    - COALESCE(p.n_persist, 0), 1), 6) AS jaccard_next "
            "FROM n LEFT JOIN pers p ON p.y = n.y "
            "LEFT JOIN n n2 ON n2.y = n.y + 1"
        ),
        # CUBE with -1/'ALL' sentinels (hashable frame, rollup convention)
        "orders_cube": (
            "SELECT COALESCE(EXTRACT(year FROM o_orderdate), -1) AS o_year, "
            "COALESCE(o_orderpriority, 'ALL') AS prio, "
            "count(*) AS n_orders, "
            "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "  / 100.0 AS total_price "
            "FROM orders GROUP BY CUBE (EXTRACT(year FROM o_orderdate), "
            "o_orderpriority)"
        ),
        # novelty: first-owner of each distinct 3-gram = min doc_id
        # (reuses the near-dup tokenization CTEs; unreferenced CTEs are
        # not executed by DuckDB)
        "novelty_rate": (
            _NEARDUP_LAB_CTE +
            ", first AS (SELECT g, min(doc_id) AS fd FROM grams GROUP BY g) "
            "SELECT g.doc_id, count(*) AS n_grams, "
            "CAST(SUM(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END) "
            "  AS BIGINT) AS n_novel, "
            "round(SUM(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END) * 1.0 "
            "  / count(*), 6) AS novelty "
            "FROM grams g JOIN first f USING (g) GROUP BY 1"
        ),
        # churn: year-set membership via self-joins on (customer, year)
        "customer_churn": (
            "WITH cy AS (SELECT DISTINCT o_custkey AS c, "
            "  EXTRACT(year FROM o_orderdate) AS y FROM orders), "
            "stat AS (SELECT b.y AS year, "
            "  SUM(CASE WHEN a.c IS NULL THEN 1 ELSE 0 END) AS n_new, "
            "  SUM(CASE WHEN a.c IS NOT NULL THEN 1 ELSE 0 END) "
            "    AS n_retained "
            "  FROM cy b LEFT JOIN cy a ON a.c = b.c AND a.y = b.y - 1 "
            "  GROUP BY 1), "
            "ch AS (SELECT a.y + 1 AS year, count(*) AS n_churned "
            "  FROM cy a LEFT JOIN cy b ON b.c = a.c AND b.y = a.y + 1 "
            "  WHERE b.c IS NULL GROUP BY 1) "
            "SELECT s.year, CAST(n_new AS BIGINT) AS n_new, "
            "CAST(n_retained AS BIGINT) AS n_retained, "
            "CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned "
            "FROM stat s LEFT JOIN ch ON ch.year = s.year"
        ),
        # skyline via NOT EXISTS strict dominance, cents-exact compare
        "parts_skyline": (
            "SELECT p_partkey, p_retailprice, p_size FROM part a "
            "WHERE NOT EXISTS (SELECT 1 FROM part b WHERE "
            "  CAST(round(b.p_retailprice * 100) AS BIGINT) <= "
            "  CAST(round(a.p_retailprice * 100) AS BIGINT) "
            "  AND b.p_size >= a.p_size "
            "  AND (CAST(round(b.p_retailprice * 100) AS BIGINT) < "
            "       CAST(round(a.p_retailprice * 100) AS BIGINT) "
            "       OR b.p_size > a.p_size))"
        ),
        # DAU / trailing-7-day WAU via the window-day explosion
        "dau_wau": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "  date_trunc('day', ts) AS day FROM events), "
            "dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day), "
            "wd AS (SELECT DISTINCT user_id, "
            "  day + o * INTERVAL 1 DAY AS wday "
            "  FROM ud CROSS JOIN generate_series(0, 6) AS t(o)), "
            "wau AS (SELECT wday, count(*) AS wau FROM wd GROUP BY wday) "
            "SELECT dau.day, dau.dau, wau.wau, "
            "round(dau.dau * 1.0 / wau.wau, 6) AS stickiness "
            "FROM dau JOIN wau ON wau.wday = dau.day"
        ),
        # per-user consecutive event-type transitions + conditional P
        "event_transitions": (
            "WITH o AS (SELECT user_id, event_type, "
            "  lead(event_type) OVER (PARTITION BY user_id "
            "    ORDER BY ts, event_id) AS nxt FROM events), "
            "c AS (SELECT event_type AS from_type, nxt AS to_type, "
            "  count(*) AS n FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2) "
            "SELECT from_type, to_type, n, round(n * 1.0 / "
            "  SUM(n) OVER (PARTITION BY from_type), 6) AS p FROM c"
        ),
        # pivot: fixed CASE columns (the spec-at-plan-time form)
        "orders_priority_pivot": (
            "SELECT EXTRACT(year FROM o_orderdate) AS o_year, "
            "CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' "
            "  THEN 1 END), 0) AS BIGINT) AS n_urgent, "
            "CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' "
            "  THEN 1 END), 0) AS BIGINT) AS n_high, "
            "CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' "
            "  THEN 1 END), 0) AS BIGINT) AS n_medium, "
            "CAST(COALESCE(SUM(CASE WHEN o_orderpriority = "
            "  '4-NOT SPECIFIED' THEN 1 END), 0) AS BIGINT) AS n_notspec, "
            "CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' "
            "  THEN 1 END), 0) AS BIGINT) AS n_low "
            "FROM orders GROUP BY 1"
        ),
        # fuzzy self-join: same blocking key + DuckDB levenshtein
        "name_edit_pairs": (
            "SELECT a.p_partkey AS u, b.p_partkey AS v, a.p_brand, "
            "levenshtein(a.p_name, b.p_name) AS dist "
            "FROM part a JOIN part b ON a.p_brand = b.p_brand "
            "AND a.p_partkey < b.p_partkey "
            "WHERE levenshtein(a.p_name, b.p_name) <= 6"
        ),
        # session-length distribution over the 30-min-gap islands
        "session_duration_stats": (
            "WITH o AS (SELECT user_id, ts, event_id, "
            "  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id "
            "    ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "  THEN 1 ELSE 0 END AS new_s FROM events), "
            "s AS (SELECT user_id, ts, sum(new_s) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "g AS (SELECT user_id, sid, count(*) AS n_ev, "
            "  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us "
            "  FROM s GROUP BY 1, 2) "
            "SELECT n_ev AS session_len, count(*) AS n_sessions, "
            "round(SUM(dur_us) / count(*) / 1000000.0, 6) "
            "  AS avg_duration_s FROM g GROUP BY 1"
        ),
        # Q8-shape market share: exact scaled-int64 revenue both sides
        "market_share": (
            "WITH o AS (SELECT o_orderkey, "
            "  EXTRACT(year FROM o_orderdate) AS o_year "
            "  FROM orders JOIN customer ON c_custkey = o_custkey "
            "  JOIN nation ON n_nationkey = c_nationkey "
            "  JOIN region ON r_regionkey = n_regionkey "
            "  WHERE r_name = 'AMERICA'), "
            "f AS (SELECT o_year, "
            "  CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "  (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev, "
            "  (n2.n_name = 'NATION_3') AS tgt "
            "  FROM lineitem JOIN o ON o_orderkey = l_orderkey "
            "  JOIN supplier ON s_suppkey = l_suppkey "
            "  JOIN nation n2 ON n2.n_nationkey = s_nationkey) "
            "SELECT o_year, "
            "round(SUM(CASE WHEN tgt THEN rev ELSE 0 END) * 1.0 "
            "  / SUM(rev), 6) AS mkt_share, "
            "round(SUM(rev) / 10000.0, 6) AS revenue_all "
            "FROM f GROUP BY o_year"
        ),
        # PII scrub: identical RE2 patterns + marker construction both sides
        "pii_scrub": (
            "WITH m AS (SELECT doc_id, text || ' contact u' || "
            "  CAST(doc_id AS VARCHAR) || '@example.com from 10.0.' || "
            "  CAST(doc_id % 256 AS VARCHAR) || '.7 tel 555-' || "
            "  CAST(1000 + doc_id % 9000 AS VARCHAR) AS t FROM documents), "
            "s1 AS (SELECT doc_id, "
            "  length(regexp_extract_all(t, "
            "    '[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]{2,}')) AS n_emails, "
            "  regexp_replace(t, "
            "    '[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]{2,}', "
            "    '<EMAIL>', 'g') AS t FROM m), "
            "s2 AS (SELECT doc_id, n_emails, "
            "  length(regexp_extract_all(t, "
            "    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips, "
            "  regexp_replace(t, "
            "    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', "
            "    '<IP>', 'g') AS t FROM s1) "
            "SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails, "
            "CAST(n_ips AS BIGINT) AS n_ips, "
            "CAST(length(regexp_extract_all(t, '\\b\\d{3}-\\d{4}\\b')) "
            "  AS BIGINT) AS n_phones, "
            "md5(regexp_replace(t, '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g')) "
            "  AS scrub_md5 FROM s2"
        ),
        # association strength: lift = n_uv * N / (n_u * n_v), top-k
        "cooccur_lift": (
            "WITH po AS (SELECT DISTINCT l_orderkey, l_partkey "
            "  FROM lineitem), "
            "np AS (SELECT l_partkey, count(*) AS n_p FROM po GROUP BY 1), "
            "no AS (SELECT count(DISTINCT l_orderkey) AS n FROM po), "
            "w AS (SELECT a.l_partkey AS u, b.l_partkey AS v, "
            "  count(*) AS n_uv FROM po a JOIN po b "
            "  ON a.l_orderkey = b.l_orderkey "
            "  AND a.l_partkey < b.l_partkey GROUP BY 1, 2) "
            "SELECT u, v, n_uv, round(n_uv * (SELECT n FROM no) * 1.0 "
            "  / (nu.n_p * nv.n_p), 6) AS lift "
            "FROM w JOIN np nu ON nu.l_partkey = u "
            "JOIN np nv ON nv.l_partkey = v "
            "WHERE n_uv >= 2 "
            "ORDER BY lift DESC, u, v LIMIT 100"
        ),
        # Q2-shape grouped argmin, exact-cents compare, suppkey tie-break
        "cheapest_supplier_per_part": (
            "SELECT l_partkey, l_suppkey, c / 100.0 AS min_price FROM ("
            "  SELECT l_partkey, l_suppkey, c, row_number() OVER ("
            "    PARTITION BY l_partkey ORDER BY c, l_suppkey) AS rn "
            "  FROM (SELECT l_partkey, l_suppkey, "
            "    CAST(round(l_extendedprice * 100) AS BIGINT) AS c "
            "    FROM lineitem)) WHERE rn = 1"
        ),
        # Q11-shape: suppliers above a fraction of global value
        "important_suppliers": (
            "WITH per AS (SELECT l_suppkey, "
            "  SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS c "
            "  FROM lineitem GROUP BY l_suppkey), "
            "tot AS (SELECT SUM(c) AS t FROM per) "
            "SELECT l_suppkey, round(c / 100.0, 6) AS value FROM per, tot "
            "WHERE c / 100.0 > 0.001 * (t / 100.0)"
        ),
        # Q14-shape: PROMO revenue share of 1995-09, exact scaled int64
        "promo_revenue_share": (
            "WITH f AS (SELECT p_type, "
            "  CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "  (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev "
            "  FROM lineitem JOIN part ON p_partkey = l_partkey "
            "  WHERE l_shipdate >= TIMESTAMP '1995-09-01' "
            "    AND l_shipdate < TIMESTAMP '1995-10-01') "
            "SELECT round(COALESCE(SUM(rev) FILTER (p_type = 'PROMO'), 0) "
            "  / 10000.0, 6) AS promo_revenue, "
            "round(100.0 * COALESCE(SUM(rev) FILTER (p_type = 'PROMO'), 0) "
            "  / SUM(rev), 6) AS promo_share_pct FROM f"
        ),
        # per-user z-score outliers with the explicit variance formula
        # (mirrors the Ray side op-for-op; never builtin STDDEV)
        "events_user_outliers": (
            "WITH c AS (SELECT user_id, "
            "  CAST(round(value * 100) AS BIGINT) AS c FROM events), "
            "a AS (SELECT user_id, COUNT(*) AS n, SUM(c) AS s, "
            "  SUM(c * c) AS s2 FROM c GROUP BY user_id), "
            "m AS (SELECT user_id, n, s / n / 100.0 AS mean, "
            "  CASE WHEN n > 1 THEN "
            "    sqrt(GREATEST((s2 - s * s / n) / (n - 1), 0.0)) / 100.0 "
            "  ELSE 0.0 END AS std FROM a) "
            "SELECT m.user_id, CAST(m.n AS BIGINT) AS n_events, "
            "round(m.mean, 6) AS mean_value, round(m.std, 6) AS std_value, "
            "CAST(COALESCE(SUM(CASE WHEN abs(c.c / 100.0 - m.mean) > "
            "  2.0 * m.std THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers "
            "FROM m JOIN c ON c.user_id = m.user_id "
            "GROUP BY m.user_id, m.n, m.mean, m.std"
        ),
        # inter-event gap bands: band = bit length of the second gap
        "events_gap_hist": (
            "WITH o AS (SELECT user_id, "
            "  epoch_us(ts) // 1000000 AS sec, "
            "  lag(epoch_us(ts) // 1000000) OVER ("
            "    PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            "  FROM events), "
            "g AS (SELECT sec - prev AS gap FROM o WHERE prev IS NOT NULL) "
            "SELECT CASE WHEN gap <= 0 THEN 0 "
            "  ELSE length(printf('%b', gap)) END AS gap_band, "
            "count(*) AS n_gaps FROM g GROUP BY 1"
        ),
        # weekly cohort retention: cohort = Monday week of first event
        "cohort_retention": (
            "WITH w AS (SELECT user_id, date_trunc('week', ts) AS wk "
            "           FROM events), "
            "f AS (SELECT user_id, min(wk) AS cohort_week FROM w "
            "      GROUP BY user_id) "
            "SELECT f.cohort_week, "
            "CAST((epoch(w.wk) - epoch(f.cohort_week)) / 604800 AS BIGINT) "
            "  AS week_offset, "
            "count(DISTINCT w.user_id) AS n_users "
            "FROM w JOIN f USING (user_id) GROUP BY 1, 2"
        ),
        # trailing 4-row moving average per user, exact-cents numerator
        "events_moving_avg": (
            "SELECT event_id, user_id, "
            "round(SUM(CAST(round(value * 100) AS BIGINT)) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) / 100.0 "
            " / COUNT(*) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mavg_value "
            "FROM events"
        ),
        # TPC-H Q17 shape, decorrelated; threshold arithmetic written
        # exactly as the Ray side computes it (0.2 * (sum_cents/100/n))
        "small_qty_revenue": (
            "WITH pp AS (SELECT l_partkey, "
            "  SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_q, "
            "  COUNT(*) AS n_q FROM lineitem GROUP BY l_partkey) "
            "SELECT COUNT(*) AS n_small, "
            "round(COALESCE(SUM(CAST(round(l_extendedprice * 100) "
            "  AS BIGINT)), 0) / 100.0 / 7.0, 6) AS avg_yearly "
            "FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "JOIN pp ON pp.l_partkey = l.l_partkey "
            "WHERE p.p_brand = 'Brand#1' "
            "AND l.l_quantity < 0.2 * (pp.sum_q / 100.0 / pp.n_q)"
        ),
        # 4-cycle census: #C4 = sum over u<w of C(codeg,2), halved
        "square_count_chain": (
            "WITH th AS (SELECT l_orderkey, l_linenumber, l_partkey "
            "            FROM lineitem WHERE l_orderkey % 16 = 0), "
            "e0 AS (SELECT l_partkey AS src, "
            "       lead(l_partkey) OVER (PARTITION BY l_orderkey "
            "                             ORDER BY l_linenumber, l_partkey) "
            "       AS dst "
            "       FROM th), "
            "und AS (SELECT DISTINCT LEAST(src, dst) AS u, "
            "               GREATEST(src, dst) AS v FROM e0 "
            "        WHERE dst IS NOT NULL AND src <> dst), "
            "sym AS (SELECT u AS a, v AS nb FROM und "
            "        UNION ALL SELECT v, u FROM und), "
            "cd AS (SELECT l.a AS u, r.nb AS w, count(*) AS c "
            "       FROM sym l JOIN sym r ON l.nb = r.a "
            "       WHERE l.a < r.nb GROUP BY 1, 2) "
            "SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) // 2 AS BIGINT) "
            "  AS n_squares FROM cd"
        ),
        # per-brand conductance over the part co-occurrence graph
        "brand_conductance": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey "
            "   AND a.l_partkey < b.l_partkey), "
            "be AS (SELECT pu.p_brand AS bu, pv.p_brand AS bv FROM e "
            "  JOIN part pu ON e.u = pu.p_partkey "
            "  JOIN part pv ON e.v = pv.p_partkey), "
            "tot AS (SELECT count(*) AS m FROM be), "
            "st AS (SELECT bu AS p_brand, "
            "         CASE WHEN bu = bv THEN 1 ELSE 0 END AS intra, "
            "         CASE WHEN bu <> bv THEN 1 ELSE 0 END AS cut FROM be "
            "       UNION ALL SELECT bv, 0, 1 FROM be WHERE bu <> bv), "
            "agg AS (SELECT p_brand, SUM(intra) AS intra, SUM(cut) AS n_cut "
            "        FROM st GROUP BY 1) "
            "SELECT p_brand, CAST(n_cut AS BIGINT) AS n_cut, "
            "CAST(2 * intra + n_cut AS BIGINT) AS volume, "
            "round(CASE WHEN LEAST(2 * intra + n_cut, "
            "  2 * (SELECT m FROM tot) - (2 * intra + n_cut)) > 0 "
            "  THEN n_cut * 1.0 / LEAST(2 * intra + n_cut, "
            "  2 * (SELECT m FROM tot) - (2 * intra + n_cut)) "
            "  ELSE 0.0 END, 6) AS conductance FROM agg"
        ),
        # TPC-H Q3 shape; revenue in exact scaled int64 on both sides,
        # top-10 under the total order (-revenue, o_orderdate, l_orderkey)
        "shipping_priority": (
            "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') "
            "  AS o_orderdate, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "         (100 - CAST(round(l_discount * 100) AS BIGINT))) "
            "  AS DOUBLE) / 10000 AS revenue "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1998-03-15' "
            "AND l_shipdate > TIMESTAMP '1998-03-15' "
            "GROUP BY 1, 2 "
            "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
        ),
        # TPC-H Q5 shape: customer and supplier nation must match
        "local_supplier_volume": (
            "SELECT r_name, n_name, count(*) AS n_items, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "         (100 - CAST(round(l_discount * 100) AS BIGINT))) "
            "  AS DOUBLE) / 10000 AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE c_nationkey = s_nationkey "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 2"
        ),
        # knn(k): mean dst in-degree per src out-degree, edge-weighted
        "avg_neighbor_degree": (
            "WITH e AS (SELECT l_orderkey AS src, l_partkey AS dst "
            "  FROM lineitem), "
            "ind AS (SELECT dst, count(*) AS d FROM e GROUP BY dst), "
            "per AS (SELECT e.src, count(*) AS k, sum(ind.d) AS sum_d "
            "  FROM e JOIN ind USING (dst) GROUP BY e.src) "
            "SELECT k AS out_degree, "
            "CAST(sum(k) AS BIGINT) AS n_edges, "
            "round(sum(sum_d) * 1.0 / sum(k), 6) AS avg_dst_in_degree "
            "FROM per GROUP BY k"
        ),
        "lang_id": _lang_id_oracle(),
        # confusion matrix of the same predictor vs the labeled column
        "lang_confusion": (
            f"WITH pred AS ({_lang_id_oracle()}) "
            "SELECT d.lang, p.lang_pred, count(*) AS n "
            "FROM documents d JOIN pred p USING (doc_id) GROUP BY 1, 2"
        ),
        "in_degree": (
            "SELECT l_partkey AS dst, count(*) AS in_degree FROM lineitem GROUP BY l_partkey"
        ),
        "out_degree": (
            "SELECT l_orderkey AS src, count(*) AS out_degree FROM lineitem GROUP BY l_orderkey"
        ),
        "degree_histogram": (
            "WITH d AS (SELECT count(*) AS degree FROM lineitem GROUP BY l_partkey) "
            "SELECT degree, count(*) AS n_vertices FROM d GROUP BY degree"
        ),
        "distinct_edges": (
            "SELECT l_orderkey AS src, l_partkey AS dst, count(*) AS multiplicity "
            "FROM lineitem GROUP BY 1, 2"
        ),
        "top_in_degree": (
            "WITH d AS (SELECT l_partkey AS dst, count(*) AS in_degree FROM lineitem GROUP BY 1) "
            "SELECT dst, in_degree FROM d ORDER BY in_degree DESC, dst LIMIT 100"
        ),
        "percent_slice_top20": (
            "WITH d AS (SELECT l_partkey AS dst, count(*) AS in_degree FROM lineitem GROUP BY 1) "
            "SELECT dst, in_degree FROM ("
            "  SELECT dst, in_degree, row_number() OVER (ORDER BY in_degree DESC, dst) AS rn, "
            "         count(*) OVER () AS n FROM d) "
            "WHERE rn <= ceil(n * 20 / 100.0)"
        ),
        "semi_join_shrink": (
            "SELECT l_partkey AS dst, count(*) AS in_degree FROM lineitem "
            "JOIN part ON l_partkey = p_partkey WHERE p_size >= 25 GROUP BY 1"
        ),
        "bloom_semi_join_shrink": (
            "SELECT l_partkey AS dst, count(*) AS in_degree FROM lineitem "
            "JOIN part ON l_partkey = p_partkey WHERE p_size >= 25 GROUP BY 1"
        ),
        "orders_rollup": (
            "WITH t AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y, "
            "  CAST(month(o_orderdate) AS BIGINT) AS m, "
            "  CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders) "
            "SELECT coalesce(y, -1) AS o_year, coalesce(m, -1) AS o_month, "
            "  count(*) AS n_orders, CAST(sum(c) AS DOUBLE) / 100 AS total_price "
            "FROM t GROUP BY ROLLUP(y, m)"
        ),
        "orders_by_nation": (
            "SELECT n_name, count(*) AS order_count, round(sum(o_totalprice), 6) AS total_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "hash_join_orders_customer": (
            "SELECT c_custkey, c_mktsegment, count(*) AS order_count, "
            "round(sum(o_totalprice), 6) AS total_price "
            "FROM customer JOIN orders ON c_custkey = o_custkey GROUP BY 1, 2"
        ),
        # Exact fixed-point accumulation on BOTH sides (quantity is whole
        # units; extendedprice/discount have <=2 decimals): scaled-int64
        # sums are order-independent, and the final int->double/100 division
        # is the identical IEEE op the Ray side performs, so the hash
        # matches bit-for-bit. round(float_sum, 6) was summation-order-
        # sensitive (round-1 red row).
        "events_decay_engagement": (
            "WITH t AS (SELECT max(ts) AS tm FROM events) "
            "SELECT user_id, round(sum(value * exp(-((epoch_us(tm) - "
            "epoch_us(ts)) / 1000000.0) / (7.0 * 86400.0))), 6) "
            "AS engagement FROM events, t GROUP BY user_id"
        ),
        "orders_interarrival_stats": (
            "WITH s AS (SELECT o_custkey, o_orderdate, lag(o_orderdate) "
            "  OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS prev "
            "  FROM orders), "
            "mg AS (SELECT o_custkey, max(epoch_us(o_orderdate) - "
            "  epoch_us(prev)) AS maxg FROM s WHERE prev IS NOT NULL "
            "  GROUP BY o_custkey), "
            "ag AS (SELECT o_custkey, count(*) AS n_orders, "
            "  epoch_us(max(o_orderdate)) - epoch_us(min(o_orderdate)) AS span "
            "  FROM orders GROUP BY o_custkey HAVING count(*) >= 2) "
            "SELECT a.o_custkey, a.n_orders, "
            "round(a.span / (86400000000.0 * (a.n_orders - 1)), 6) "
            "  AS mean_gap_days, "
            "round(m.maxg / 86400000000.0, 6) AS max_gap_days "
            "FROM ag a JOIN mg m ON a.o_custkey = m.o_custkey"
        ),
        "nation_trade_balance": (
            "WITH s AS (SELECT s_nationkey AS nk, "
            "  sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS sup "
            "  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
            "  GROUP BY 1), "
            "c AS (SELECT c_nationkey AS nk, "
            "  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spd "
            "  FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1) "
            "SELECT n_name, "
            "round(CAST(COALESCE(s.sup, 0) AS DOUBLE) / 10000, 6) "
            "  AS supply_revenue, "
            "round(CAST(COALESCE(c.spd, 0) AS DOUBLE) / 100, 6) "
            "  AS customer_spend, "
            "round(CAST(COALESCE(s.sup, 0) AS DOUBLE) / 10000 - "
            "      CAST(COALESCE(c.spd, 0) AS DOUBLE) / 100, 6) AS balance "
            "FROM nation LEFT JOIN s ON s.nk = n_nationkey "
            "LEFT JOIN c ON c.nk = n_nationkey"
        ),
        "brand_yoy_growth": (
            "WITH per AS (SELECT p_brand, "
            "  CAST(year(l_shipdate) AS BIGINT) AS l_year, "
            "  sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev "
            "  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY 1, 2) "
            "SELECT p_brand, l_year, "
            "round(CAST(rev AS DOUBLE) / 10000, 6) AS revenue, "
            "COALESCE(CASE WHEN lag(l_year) OVER w = l_year - 1 "
            "  AND lag(rev) OVER w <> 0 THEN round(CAST(rev AS DOUBLE) / "
            "  CAST(lag(rev) OVER w AS DOUBLE), 6) END, 0.0) AS yoy_growth "
            "FROM per WINDOW w AS (PARTITION BY p_brand ORDER BY l_year)"
        ),
        "order_priority_check": (
            "SELECT o_orderpriority, count(*) AS order_count FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1996-07-01' "
            "AND o_orderdate < TIMESTAMP '1996-10-01' "
            "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY o_orderpriority"
        ),
        "customer_order_counts": (
            "SELECT c_count, count(*) AS custdist FROM ("
            "  SELECT c_custkey, count(o_orderkey) AS c_count FROM customer "
            "  LEFT JOIN orders ON c_custkey = o_custkey "
            "  AND o_orderpriority <> '4-NOT SPECIFIED' "
            "  GROUP BY c_custkey) GROUP BY c_count"
        ),
        "large_volume_customers": (
            "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, "
            "sum(l_quantity) AS sum_qty "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON o_orderkey = l_orderkey "
            "GROUP BY 1, 2, 3, 4, 5 HAVING sum(l_quantity) > 150"
        ),
        "top_supplier": (
            "WITH rev AS (SELECT l_suppkey, "
            "  sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS r "
            "  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "  AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, "
            "round(CAST(r AS DOUBLE) / 10000, 6) AS total_revenue "
            "FROM rev JOIN supplier ON s_suppkey = l_suppkey "
            "WHERE r = (SELECT max(r) FROM rev)"
        ),
        "sales_opportunity": (
            "WITH avgbal AS (SELECT (CAST(sum(CAST(round(c_acctbal * 100) "
            "  AS BIGINT)) AS DOUBLE) / 100) / count(*) AS a "
            "  FROM customer WHERE c_acctbal > 0) "
            "SELECT c_nationkey, count(*) AS numcust, "
            "round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) "
            "  AS DOUBLE) / 100, 6) AS totacctbal "
            "FROM customer, avgbal WHERE c_acctbal > a "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "  AND o_orderdate >= TIMESTAMP '2000-01-01') "
            "GROUP BY c_nationkey"
        ),
        "volume_shipping": (
            "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS l_year, "
            "round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) "
            "  / 10000, 6) AS revenue "
            "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ns ON ns.n_nationkey = s_nationkey "
            "JOIN nation nc ON nc.n_nationkey = c_nationkey "
            "WHERE (ns.n_name = 'NATION_18' AND nc.n_name = 'NATION_19') "
            "OR (ns.n_name = 'NATION_19' AND nc.n_name = 'NATION_18') "
            "GROUP BY 1, 2, 3"
        ),
        "returned_items_top": (
            "WITH rev AS (SELECT o_custkey, "
            "  sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS r "
            "  FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "  WHERE l_returnflag = 'R' "
            "  AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "  AND o_orderdate < TIMESTAMP '1996-04-01' GROUP BY o_custkey) "
            "SELECT c_custkey, c_name, c_acctbal, "
            "round(CAST(r AS DOUBLE) / 10000, 6) AS revenue "
            "FROM rev JOIN customer ON c_custkey = o_custkey "
            "ORDER BY r DESC, c_custkey LIMIT 20"
        ),
        "disjunctive_revenue": (
            "SELECT COALESCE(round(CAST(sum("
            "  CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) "
            "  / 10000, 6), 0.0) AS revenue, count(*) AS n_items "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 "
            "  AND l_quantity BETWEEN 1 AND 20) "
            "OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 "
            "  AND l_quantity BETWEEN 10 AND 35) "
            "OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 "
            "  AND l_quantity BETWEEN 20 AND 50)"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 "
            "  AS sum_base_price, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "         (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 "
            "  AS sum_disc_price, "
            "count(*) AS count_order FROM lineitem GROUP BY 1, 2"
        ),
        "orders_ts_filter": (
            "SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS year "
            "FROM orders WHERE year(o_orderdate) >= 1995"
        ),
        "order_year_snapshot": (
            "SELECT o_custkey, year, o_orderkey FROM ("
            "  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS year, o_orderkey, "
            "    row_number() OVER (PARTITION BY o_custkey, year(o_orderdate) "
            "      ORDER BY abs(epoch(make_timestamp(CAST(year(o_orderdate) AS BIGINT), 12, 31, "
            "                    23, 59, 59.0)) - epoch(o_orderdate)), o_orderkey) AS rn "
            "  FROM orders) WHERE rn = 1"
        ),
        "order_year_snapshot_tags": (
            "WITH snaps AS ("
            "  SELECT o_custkey, year, o_orderkey FROM ("
            "    SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS year, o_orderkey, "
            "      row_number() OVER (PARTITION BY o_custkey, year(o_orderdate) "
            "        ORDER BY abs(epoch(make_timestamp(CAST(year(o_orderdate) AS BIGINT), 12, 31, "
            "                      23, 59, 59.0)) - epoch(o_orderdate)), o_orderkey) AS rn "
            "    FROM orders) WHERE rn = 1"
            "), nxt AS ("
            "  SELECT o_custkey, o_orderkey, year, "
            "    CAST(lead(year, 1, (SELECT max(year(o_orderdate)) + 1 FROM orders)) "
            "      OVER (PARTITION BY o_custkey ORDER BY year) AS INTEGER) AS ny "
            "  FROM snaps) "
            "SELECT o_custkey, o_orderkey, year AS snap_year, "
            "  CAST(unnest(generate_series(year, ny - 1)) AS INTEGER) AS tag_year "
            "FROM nxt"
        ),
        "link_entropy_per_vertex": (
            "SELECT l_orderkey AS src, round(log2(sum(l_quantity)) - "
            "sum(l_quantity * log2(l_quantity)) / sum(l_quantity), 6) AS link_entropy "
            "FROM lineitem GROUP BY 1"
        ),
        "entropy_report": (
            "WITH e AS (SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem), "
            "roles AS (SELECT src AS id, 0 AS ind, 1 AS outd FROM e "
            "          UNION ALL SELECT dst, 1, 0 FROM e), "
            "deg AS (SELECT id, sum(ind) AS ind, sum(outd) AS outd FROM roles GROUP BY id), "
            "s AS (SELECT "
            "  sum(ind) AS s_in, "
            "  sum(CASE WHEN ind > 0 THEN ind * log2(ind) ELSE 0 END) AS s1_in, "
            "  count(*) FILTER (ind > 0) AS n_in, "
            "  sum(outd) AS s_out, "
            "  sum(CASE WHEN outd > 0 THEN outd * log2(outd) ELSE 0 END) AS s1_out, "
            "  count(*) FILTER (outd > 0) AS n_out, "
            "  sum(ind + outd) AS s_all, "
            "  sum((ind + outd) * log2(ind + outd)) AS s1_all, "
            "  count(*) AS node_count FROM deg), "
            "hin AS (SELECT count(*) AS c FROM deg GROUP BY ind), "
            "hout AS (SELECT count(*) AS c FROM deg GROUP BY outd), "
            "dde_in AS (SELECT log2(sum(c)) - sum(c * log2(c)) / sum(c) AS v FROM hin), "
            "dde_out AS (SELECT log2(sum(c)) - sum(c * log2(c)) / sum(c) AS v FROM hout) "
            "SELECT round(log2(s_in) - s1_in / s_in, 6) AS entropy_in, "
            "  round(log2(s_out) - s1_out / s_out, 6) AS entropy_out, "
            "  round(log2(s_all) - s1_all / s_all, 6) AS entropy_all, "
            "  round(dde_in.v, 6) AS degree_dist_entropy_in, "
            "  round(dde_out.v, 6) AS degree_dist_entropy_out, "
            "  node_count, n_in AS node_in_count, n_out AS node_out_count "
            "FROM s, dde_in, dde_out"
        ),
        "cooccur_edges": (
            "SELECT u, v, count(*) AS n_orders FROM ("
            "  SELECT DISTINCT a.l_orderkey, a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey) "
            "GROUP BY u, v"
        ),
        "events_daily_user": (
            "SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n_events, "
            "round(sum(value), 6) AS sum_value FROM events GROUP BY 1, 2"
        ),
        # CC oracle: synchronous min-label propagation as a recursive CTE
        # (exact integer output; label = min vertex id in the component,
        # matching engine/components.py). 32 rounds >> the cooccur graph's
        # min-vertex eccentricity at sf0.01.
        # frontier expansion with UNION-dedup on (id, dist); the dense
        # co-occurrence graph is shallow, so dist caps at 32 safely
        "bfs_cooccur": (
            "WITH RECURSIVE e AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"
            "), seed AS (SELECT min(u) AS s FROM e), "
            "bfs(id, dist) AS ("
            "  SELECT s, 0 FROM seed "
            "  UNION "
            "  SELECT e.v, bfs.dist + 1 FROM bfs JOIN e ON e.u = bfs.id "
            "  WHERE bfs.dist < 32"
            ") "
            "SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM bfs GROUP BY id"
        ),
        # Newman modularity of the CC partition of the undirected part-chain
        # graph: recursive-CTE hash-min labels feed the general two-term
        # Q = intra/m - sum_c (tot_c/2m)^2 (chain graph: hundreds of
        # components, so the degree term is nontrivial).
        "modularity_components": (
            "WITH RECURSIVE th AS (SELECT l_orderkey, l_linenumber, "
            "  l_partkey FROM lineitem WHERE l_orderkey % 16 = 0), "
            "e0 AS (SELECT l_partkey AS src, "
            "       lead(l_partkey) OVER (PARTITION BY l_orderkey "
            "                             ORDER BY l_linenumber, l_partkey) "
            "       AS dst "
            "       FROM th), "
            "und AS (SELECT DISTINCT LEAST(src, dst) AS u, "
            "               GREATEST(src, dst) AS v FROM e0 "
            "        WHERE dst IS NOT NULL AND src <> dst), "
            "e AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und), "
            "verts AS (SELECT DISTINCT u AS id FROM e), "
            "lp(iter, id, label) AS ("
            "  SELECT 0, id, id FROM verts "
            "  UNION ALL "
            "  SELECT lp.iter + 1, lp.id, LEAST(lp.label, MIN(nbr.label)) "
            "  FROM lp JOIN e ON e.u = lp.id JOIN lp nbr ON nbr.id = e.v "
            "  WHERE lp.iter < 128 GROUP BY lp.iter, lp.id, lp.label"
            "), lab AS (SELECT id, MIN(label) AS comm FROM lp GROUP BY id), "
            "deg AS (SELECT u AS id, COUNT(*) AS k FROM e GROUP BY u), "
            "m AS (SELECT COUNT(*) AS m FROM und), "
            "intra AS (SELECT COUNT(*) AS i FROM und "
            "  JOIN lab a ON a.id = und.u JOIN lab b ON b.id = und.v "
            "  WHERE a.comm = b.comm), "
            "tot AS (SELECT l.comm, SUM(d.k) AS tot FROM deg d "
            "  JOIN lab l ON l.id = d.id GROUP BY 1), "
            "sq AS (SELECT SUM((tot * 1.0 / (2 * m.m)) * "
            "                  (tot * 1.0 / (2 * m.m))) AS s, "
            "              COUNT(*) AS nc FROM tot, m) "
            "SELECT sq.nc AS n_communities, m.m AS m_edges, "
            "ROUND(intra.i * 1.0 / m.m - sq.s, 6) AS modularity "
            "FROM intra, sq, m"
        ),
        # SALSA oracle: the same closed form in SQL — multiplicity weights,
        # hash-min CC over side-encoded vertices (2u / 2v+1) as a recursive
        # CTE, per-component degree sums, score = (n_side_comp/n_side_total)
        # * (deg/comp_degsum). The supplier-part graph is dense (every
        # supplier touches hundreds of parts), so 32 min-label rounds are
        # far beyond its min-vertex eccentricity.
        "salsa_supplier_part": (
            "WITH RECURSIVE ew AS ("
            "  SELECT l_suppkey AS src, l_partkey AS dst, count(*) AS w "
            "  FROM lineitem GROUP BY 1, 2"
            "), enc AS (SELECT 2 * src AS u, 2 * dst + 1 AS v FROM ew), "
            "e AS (SELECT u, v FROM enc UNION SELECT v, u FROM enc), "
            "verts AS (SELECT DISTINCT u AS id FROM e), "
            "lp(iter, id, label) AS ("
            "  SELECT 0, id, id FROM verts "
            "  UNION ALL "
            "  SELECT lp.iter + 1, lp.id, LEAST(lp.label, MIN(nbr.label)) "
            "  FROM lp JOIN e ON e.u = lp.id JOIN lp nbr ON nbr.id = e.v "
            "  WHERE lp.iter < 32 GROUP BY lp.iter, lp.id, lp.label"
            "), lab AS (SELECT id, MIN(label) AS label FROM lp GROUP BY id), "
            "outdeg AS (SELECT src AS id, SUM(w) AS deg FROM ew GROUP BY 1), "
            "indeg AS (SELECT dst AS id, SUM(w) AS deg FROM ew GROUP BY 1), "
            "hub AS (SELECT o.id, o.deg, l.label FROM outdeg o "
            "        JOIN lab l ON l.id = 2 * o.id), "
            "auth AS (SELECT i.id, i.deg, l.label FROM indeg i "
            "         JOIN lab l ON l.id = 2 * i.id + 1), "
            "hubc AS (SELECT label, SUM(deg) AS degsum, COUNT(*) AS n "
            "         FROM hub GROUP BY 1), "
            "authc AS (SELECT label, SUM(deg) AS degsum, COUNT(*) AS n "
            "          FROM auth GROUP BY 1), "
            "nh AS (SELECT COUNT(*) AS n FROM hub), "
            "na AS (SELECT COUNT(*) AS n FROM auth) "
            "SELECT h.id, 'hub' AS side, "
            "  ROUND((c.n * 1.0 / nh.n) * (h.deg * 1.0 / c.degsum), 9) AS score "
            "FROM hub h JOIN hubc c USING (label), nh "
            "UNION ALL "
            "SELECT a.id, 'auth' AS side, "
            "  ROUND((c.n * 1.0 / na.n) * (a.deg * 1.0 / c.degsum), 9) AS score "
            "FROM auth a JOIN authc c USING (label), na"
        ),
        "butterfly_count": (
            "WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "pairs AS ("
            "  SELECT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM pp a JOIN pp b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "), cod AS (SELECT u, v, COUNT(*) AS w FROM pairs GROUP BY u, v) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_copairs, "
            "       CAST(SUM(w) AS BIGINT) AS n_wedges, "
            "       CAST(SUM(w * (w - 1) // 2) AS BIGINT) AS n_butterflies "
            "FROM cod"
        ),
        "rich_club": (
            "WITH th AS (SELECT l_orderkey, l_linenumber, l_partkey "
            "            FROM lineitem WHERE l_orderkey % 16 = 0), "
            "e0 AS (SELECT l_partkey AS src, "
            "              lead(l_partkey) OVER (PARTITION BY l_orderkey "
            "                                    ORDER BY l_linenumber, "
            "                                    l_partkey) AS dst "
            "       FROM th), "
            "ed AS (SELECT DISTINCT src, dst FROM e0 "
            "       WHERE dst IS NOT NULL AND src <> dst), "
            "e AS (SELECT DISTINCT LEAST(src, dst) AS u, "
            "             GREATEST(src, dst) AS v FROM ed), "
            "und AS (SELECT u AS x FROM e UNION ALL SELECT v FROM e), "
            "deg AS (SELECT x, count(*) AS d FROM und GROUP BY x), "
            "j AS (SELECT LEAST(du.d, dv.d) AS m FROM e "
            "  JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v), "
            "ks AS (SELECT unnest([2, 4, 8, 16, 32]) AS k) "
            "SELECT CAST(ks.k AS BIGINT) AS k, "
            "  (SELECT count(*) FROM deg WHERE d > ks.k) AS n_rich_nodes, "
            "  (SELECT count(*) FROM j WHERE m > ks.k) AS n_rich_edges, "
            "  CASE WHEN (SELECT count(*) FROM deg WHERE d > ks.k) >= 2 "
            "    THEN round(2.0 * (SELECT count(*) FROM j WHERE m > ks.k) "
            "      / ((SELECT count(*) FROM deg WHERE d > ks.k) "
            "         * ((SELECT count(*) FROM deg WHERE d > ks.k) - 1)), 6) "
            "    ELSE 0.0 END AS phi "
            "FROM ks ORDER BY k"
        ),
        "brand_assortativity": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), "
            "be AS (SELECT pu.p_brand AS bu, pv.p_brand AS bv FROM e "
            "  JOIN part pu ON pu.p_partkey = e.u "
            "  JOIN part pv ON pv.p_partkey = e.v), "
            "tot AS (SELECT 2 * count(*) AS total, "
            "               2 * SUM(CASE WHEN bu = bv THEN 1 ELSE 0 END) AS same "
            "        FROM be), "
            "ends AS (SELECT brand, count(*) AS c FROM "
            "  (SELECT bu AS brand FROM be UNION ALL SELECT bv FROM be) "
            "  GROUP BY brand), "
            "s AS (SELECT SUM(c * c) AS s2 FROM ends) "
            "SELECT CAST(total AS BIGINT) AS n_ends, "
            "  CAST(same AS BIGINT) AS n_same_brand_ends, "
            "  round(CAST(same * total - s2 AS DOUBLE) "
            "        / CAST(total * total - s2 AS DOUBLE), 6) "
            "    AS assortativity_brand "
            "FROM tot, s"
        ),
        "lexical_richness": (
            "WITH toks AS (SELECT source, "
            "  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "  FROM documents), "
            "ct AS (SELECT source, token, count(*) AS cf FROM toks "
            "       GROUP BY 1, 2), "
            "agg AS (SELECT source, SUM(cf) AS n_tokens, COUNT(*) AS n_types, "
            "        SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS n_hapax "
            "        FROM ct GROUP BY source) "
            "SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "  CAST(n_types AS BIGINT) AS n_types, "
            "  CAST(n_hapax AS BIGINT) AS n_hapax, "
            "  round(n_types * 1.0 / n_tokens, 6) AS ttr, "
            "  round(n_hapax * 1.0 / n_types, 6) AS hapax_frac "
            "FROM agg ORDER BY source"
        ),
        "graph_growth": (
            "WITH ed AS (SELECT DISTINCT year(o_orderdate) AS yr, "
            "            l_orderkey, l_partkey "
            "            FROM lineitem JOIN orders ON o_orderkey = l_orderkey), "
            "eyr AS (SELECT yr, count(*) AS n_edges FROM ed GROUP BY yr), "
            "ap AS (SELECT DISTINCT yr, l_partkey FROM ed), "
            "act AS (SELECT yr, count(*) AS n_active_parts FROM ap GROUP BY yr), "
            "fs AS (SELECT l_partkey, MIN(yr) AS yr FROM ap GROUP BY l_partkey), "
            "nw AS (SELECT yr, count(*) AS n_new_parts FROM fs GROUP BY yr) "
            "SELECT CAST(act.yr AS BIGINT) AS year, "
            "  CAST(eyr.n_edges AS BIGINT) AS n_edges, "
            "  CAST(act.n_active_parts AS BIGINT) AS n_active_parts, "
            "  CAST(COALESCE(nw.n_new_parts, 0) AS BIGINT) AS n_new_parts, "
            "  round(COALESCE(nw.n_new_parts, 0) * 1.0 / act.n_active_parts, 6) "
            "    AS new_frac "
            "FROM act JOIN eyr ON eyr.yr = act.yr "
            "LEFT JOIN nw ON nw.yr = act.yr ORDER BY 1"
        ),
        "source_overlap": (
            "WITH toks AS (SELECT source, regexp_extract_all(lower(text), "
            "              '[a-z0-9]+') AS ws FROM documents), "
            "grams AS (SELECT DISTINCT source, unnest([ws[i] || ' ' || ws[i+1] "
            "  || ' ' || ws[i+2] for i in generate_series(1, "
            "  greatest(len(ws) - 2, 0))]) AS g FROM toks), "
            "sz AS (SELECT source, count(*) AS n FROM grams GROUP BY 1), "
            "inter AS (SELECT a.source AS sa, b.source AS sb, count(*) AS i "
            "  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source "
            "  GROUP BY 1, 2) "
            "SELECT sa AS source_a, sb AS source_b, "
            "  za.n AS n_a, zb.n AS n_b, CAST(i AS BIGINT) AS n_shared, "
            "  round(i * 1.0 / (za.n + zb.n - i), 6) AS jaccard "
            "FROM inter JOIN sz za ON sa = za.source "
            "JOIN sz zb ON sb = zb.source ORDER BY 1, 2"
        ),
        "degree_powerlaw_alpha": (
            "WITH deg AS (SELECT l_partkey, count(*) AS d "
            "             FROM lineitem GROUP BY 1), "
            "f AS (SELECT d FROM deg WHERE d >= 5) "
            "SELECT CAST(count(*) AS BIGINT) AS n_tail, "
            "  round(1.0 + count(*) / SUM(LN(d / 4.5)), 6) AS alpha "
            "FROM f"
        ),
        "dup_cluster_sizes": (
            "WITH RECURSIVE toks AS (SELECT doc_id, regexp_extract_all("
            "  lower(text), '[a-z0-9]+') AS ws FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, unnest([ws[i] || ' ' || ws[i+1] "
            "  || ' ' || ws[i+2] for i in generate_series(1, "
            "  greatest(len(ws) - 2, 0))]) AS g FROM toks), "
            "sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1), "
            "inter AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i "
            "  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id "
            "  GROUP BY 1, 2), "
            "p AS (SELECT u, v FROM inter "
            "  JOIN sz sa ON u = sa.doc_id JOIN sz sb ON v = sb.doc_id "
            "  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.2), "
            "e AS (SELECT u AS a, v AS b FROM p UNION SELECT v, u FROM p), "
            "reach AS (SELECT a, b FROM e "
            "  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a), "
            "lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id "
            "  FROM reach GROUP BY a), "
            "cs AS (SELECT cluster_id, count(*) AS csz FROM lab GROUP BY 1) "
            "SELECT CAST(csz AS BIGINT) AS cluster_size, "
            "  CAST(count(*) AS BIGINT) AS n_clusters "
            "FROM cs GROUP BY csz ORDER BY csz"
        ),
        "connected_components": (
            "WITH RECURSIVE e AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"
            "), verts AS (SELECT DISTINCT u AS id FROM e), "
            "lp(iter, id, label) AS ("
            "  SELECT 0, id, id FROM verts "
            "  UNION ALL "
            "  SELECT lp.iter + 1, lp.id, LEAST(lp.label, MIN(nbr.label)) "
            "  FROM lp JOIN e ON e.u = lp.id JOIN lp nbr ON nbr.id = e.v "
            "  WHERE lp.iter < 32 GROUP BY lp.iter, lp.id, lp.label"
            ") "
            "SELECT id, MIN(label) AS label FROM lp GROUP BY id"
        ),
        # coreness oracle: the same h-index iteration (Lü et al. 2016) as a
        # recursive CTE — estimates are monotone non-increasing and converge
        # exactly to the peeling coreness, so MIN over the 32-round history
        # is the fixpoint (engine/kcore.py converges in far fewer rounds).
        "coreness": (
            "WITH RECURSIVE e AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"
            "), deg AS (SELECT u AS id, COUNT(*) AS d FROM e GROUP BY u), "
            "ks(iter, id, core) AS ("
            "  SELECT 0, id, d FROM deg "
            "  UNION ALL "
            "  SELECT iter, id, LEAST(cur, MAX(LEAST(nbr_est, rn))) FROM ("
            "    SELECT ks.iter + 1 AS iter, ks.id, ks.core AS cur, "
            "           nbr.core AS nbr_est, "
            "           ROW_NUMBER() OVER (PARTITION BY ks.id "
            "                              ORDER BY nbr.core DESC) AS rn "
            "    FROM ks JOIN e ON e.u = ks.id JOIN ks nbr ON nbr.id = e.v "
            "    WHERE ks.iter < 32"
            "  ) GROUP BY iter, id, cur"
            ") "
            "SELECT id, MIN(core) AS core FROM ks GROUP BY id"
        ),
        # LPA oracle: the engine's exact update rule (adopt the most frequent
        # neighbor label, ties to the smallest label) run synchronously for
        # the same max_iters=15 cap as labelprop_cooccur; a fixpoint reached
        # earlier is stable under further rounds, so iter=15 equals the
        # engine's final state whether it converged or hit the cap. arg_min
        # key packs (count desc, label asc) into one int64.
        "label_propagation": (
            "WITH RECURSIVE e AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"
            "), verts AS (SELECT DISTINCT u AS id FROM e), "
            "lp(iter, id, label) AS ("
            "  SELECT 0, id, id FROM verts "
            "  UNION ALL "
            "  SELECT iter, id, arg_min(label, label - cnt * 1000000000) FROM ("
            "    SELECT lp.iter + 1 AS iter, lp.id, nbr.label, COUNT(*) AS cnt "
            "    FROM lp JOIN e ON e.u = lp.id JOIN lp nbr ON nbr.id = e.v "
            "    WHERE lp.iter < 15 GROUP BY lp.iter, lp.id, nbr.label"
            "  ) GROUP BY iter, id"
            ") "
            "SELECT id, label FROM lp WHERE iter = 15"
        ),
        "component_sizes": (
            "WITH RECURSIVE e AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"
            "), verts AS (SELECT DISTINCT u AS id FROM e), "
            "lp(iter, id, label) AS ("
            "  SELECT 0, id, id FROM verts "
            "  UNION ALL "
            "  SELECT lp.iter + 1, lp.id, LEAST(lp.label, MIN(nbr.label)) "
            "  FROM lp JOIN e ON e.u = lp.id JOIN lp nbr ON nbr.id = e.v "
            "  WHERE lp.iter < 32 GROUP BY lp.iter, lp.id, lp.label"
            "), final AS (SELECT id, MIN(label) AS label FROM lp GROUP BY id) "
            "SELECT label, count(*) AS size FROM final GROUP BY label"
        ),
        "triangle_count": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey) "
            "SELECT count(*) AS n_triangles FROM e a "
            "JOIN e b ON b.u = a.u AND b.v > a.v "
            "JOIN e c ON c.u = a.v AND c.v = b.v"
        ),
        "global_clustering": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), "
            "und AS (SELECT u AS x FROM e UNION ALL SELECT v FROM e), "
            "deg AS (SELECT x, count(*) AS d FROM und GROUP BY x), "
            "w AS (SELECT sum(d * (d - 1) // 2) AS n_wedges FROM deg), "
            "t AS (SELECT count(*) AS n_triangles FROM e a "
            "  JOIN e b ON b.u = a.u AND b.v > a.v "
            "  JOIN e c ON c.u = a.v AND c.v = b.v) "
            "SELECT CAST(n_wedges AS BIGINT) AS n_wedges, "
            "CAST(n_triangles AS BIGINT) AS n_triangles, "
            "round(3.0 * n_triangles / n_wedges, 6) AS global_cc FROM w, t"
        ),
        "degree_assortativity": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), "
            "und AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e), "
            "deg AS (SELECT x, count(*) AS d FROM und GROUP BY x), "
            "j AS (SELECT du.d AS dx, dv.d AS dy FROM und "
            "  JOIN deg du ON du.x = und.x JOIN deg dv ON dv.x = und.y), "
            "m AS (SELECT count(*) AS n, sum(dx) AS sx, sum(dx * dx) AS sxx, "
            "  sum(dx * dy) AS sxy FROM j) "
            "SELECT CAST(n AS BIGINT) AS n_endpoints, "
            "round(CAST(n * sxy - sx * sx AS DOUBLE) / "
            "CAST(n * sxx - sx * sx AS DOUBLE), 6) AS assortativity FROM m"
        ),
        "adamic_adar_topk": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), "
            "und AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e), "
            "deg AS (SELECT x, count(*) AS d FROM und GROUP BY x), "
            "aa AS (SELECT e.u, e.v, sum(1.0 / log2(dw.d)) AS s "
            "  FROM e JOIN und n1 ON n1.x = e.u "
            "  JOIN und n2 ON n2.x = e.v AND n2.y = n1.y "
            "  JOIN deg dw ON dw.x = n1.y GROUP BY e.u, e.v) "
            "SELECT u, v, round(s, 6) AS aa FROM aa "
            "ORDER BY round(s, 6) DESC, u, v LIMIT 50"
        ),
        "jaccard_topk": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), "
            "und AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e), "
            "deg AS (SELECT x, count(*) AS d FROM und GROUP BY x), "
            "cn AS (SELECT e.u, e.v, count(*) AS c "
            "  FROM e JOIN und n1 ON n1.x = e.u "
            "  JOIN und n2 ON n2.x = e.v AND n2.y = n1.y GROUP BY e.u, e.v) "
            "SELECT cn.u, cn.v, "
            "  round(c * 1.0 / (du.d + dv.d - c), 6) AS jaccard "
            "FROM cn JOIN deg du ON du.x = cn.u JOIN deg dv ON dv.x = cn.v "
            "ORDER BY jaccard DESC, u, v LIMIT 50"
        ),
        "local_clustering": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), "
            "und AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e), "
            "deg AS (SELECT x, count(*) AS d FROM und GROUP BY x), "
            "cn AS (SELECT e.u, e.v, count(*) AS c "
            "  FROM e JOIN und n1 ON n1.x = e.u "
            "  JOIN und n2 ON n2.x = e.v AND n2.y = n1.y GROUP BY e.u, e.v), "
            "tri AS (SELECT x, CAST(sum(c) AS BIGINT) AS c2 FROM ("
            "  SELECT u AS x, c FROM cn UNION ALL SELECT v, c FROM cn"
            ") GROUP BY x) "
            "SELECT d.x AS id, d.d AS deg, "
            "  CAST(COALESCE(tri.c2, 0) / 2 AS BIGINT) AS n_tri, "
            "  round(COALESCE(tri.c2, 0) * 1.0 / (d.d * (d.d - 1)), 6) AS lcc "
            "FROM deg d LEFT JOIN tri ON tri.x = d.x WHERE d.d >= 2"
        ),
        "segment_dedup": (
            "WITH segs AS ("
            "  SELECT doc_id, CAST(x.i AS BIGINT) AS seg_idx, md5(x.seg) AS h "
            "  FROM ("
            "    SELECT doc_id, unnest(list_transform("
            "      range(0, CAST(ceil(len(toks) / 20.0) AS BIGINT)), "
            "      i -> {'i': i, "
            "            'seg': array_to_string(toks[i*20+1 : i*20+20], ' ')}"
            "    )) AS x "
            "    FROM (SELECT doc_id, "
            "          regexp_extract_all(lower(text), '[a-z0-9]+') AS toks "
            "          FROM documents)"
            "  ) t(doc_id, x)"
            "), keyed AS ("
            "  SELECT doc_id, h, doc_id * 1048576 + seg_idx AS ordkey FROM segs"
            "), firsts AS ("
            "  SELECT h, min(ordkey) AS firstkey FROM keyed GROUP BY h"
            ") "
            "SELECT k.doc_id, count(*) AS n_segs, "
            "  count(*) FILTER (k.ordkey = f.firstkey) AS n_kept "
            "FROM keyed k JOIN firsts f USING (h) GROUP BY k.doc_id"
        ),
        "distinct_ngram_ratio": (
            "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "  '[a-z0-9]+') AS ws FROM documents), "
            "g AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] "
            "  for i in generate_series(1, greatest(len(ws) - 1, 0))]) AS gram "
            "  FROM t) "
            "SELECT doc_id, count(*) AS n_grams, "
            "  CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct, "
            "  round(count(DISTINCT gram) * 1.0 / count(*), 6) "
            "    AS distinct_ratio "
            "FROM g GROUP BY doc_id"
        ),
        "zipf_slope": (
            "WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), "
            "  '[a-z0-9]+')) AS token FROM documents), "
            "counts AS (SELECT token, count(*) AS n FROM toks GROUP BY token), "
            "ranked AS (SELECT n, row_number() OVER "
            "  (ORDER BY n DESC, token) AS rank FROM counts) "
            "SELECT CAST(count(*) AS BIGINT) AS vocab_size, "
            "  round(regr_slope(ln(n), ln(rank)), 6) AS zipf_slope FROM ranked"
        ),
        "events_funnel": (
            "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events "
            "  WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "  JOIN v USING (user_id) "
            "  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id), "
            "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
            "  JOIN c USING (user_id) "
            "  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id) "
            "SELECT * FROM ("
            "  SELECT 1 AS stage, 'view' AS event_type, count(*) AS n_users FROM v "
            "  UNION ALL SELECT 2, 'click', count(*) FROM c "
            "  UNION ALL SELECT 3, 'purchase', count(*) FROM p)"
        ),
        "bigram_lm_top": (
            "WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') "
            "  AS ws FROM documents), "
            "pairs AS (SELECT unnest([{'a': ws[i], 'b': ws[i+1]} "
            "  for i in generate_series(1, greatest(len(ws) - 1, 0))]) AS x "
            "  FROM toks), "
            "pc AS (SELECT x.a AS a, x.b AS b, count(*) AS n "
            "  FROM pairs GROUP BY 1, 2), "
            "tot AS (SELECT a, sum(n) AS na FROM pc GROUP BY a) "
            "SELECT pc.a, pc.b, n, round(n * 1.0 / na, 6) AS p "
            "FROM pc JOIN tot USING (a) WHERE n >= 5 "
            "ORDER BY p DESC, pc.a, pc.b LIMIT 50"
        ),
        "quality_weighted_sample": (
            "WITH rated AS ("
            "  SELECT doc_id, source, "
            "    LEAST(1.0, GREATEST(0.05, n_chars / 400.0)) AS rate, "
            "    substring(md5(text), 1, 8) AS fp8 "
            "  FROM documents"
            ") "
            "SELECT doc_id, source, rate FROM rated "
            "WHERE fp8 < lpad(lower(to_hex(CAST(LEAST(floor(rate * "
            "  4294967296.0), 4294967295.0) AS BIGINT))), 8, '0')"
        ),
        "doc_chunks": (
            "SELECT doc_id, CAST(x.i AS BIGINT) AS chunk_idx, "
            "  CAST(x.s AS BIGINT) AS chunk_start, "
            "  CAST(x.l AS BIGINT) AS chunk_len, x.h AS chunk_md5 "
            "FROM ("
            "  SELECT doc_id, unnest(list_transform("
            "    range(0, CAST((length(text) - 1) // 150 AS BIGINT) + 1), "
            "    i -> {'i': i, 's': i*150 + 1, "
            "          'l': length(substring(text, CAST(i*150 + 1 AS INT), 200)), "
            "          'h': md5(substring(text, CAST(i*150 + 1 AS INT), 200))}"
            "  )) AS x "
            "  FROM documents WHERE length(text) >= 1"
            ") t(doc_id, x)"
        ),
        # BM25: arithmetic written in the Ray kernel's exact op order
        # (avgdl = exact-int sum/count; contribution
        # idf*tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))); both sides round the
        # per-(query,doc) sum to 6 BEFORE ranking so ulp-level libm/sum-
        # order drift cannot flip the top-k cut
        "bm25_topk": (
            "WITH dl AS ("
            "  SELECT doc_id, CAST(length(regexp_extract_all(lower(text), "
            "    '[a-z0-9]+')) AS BIGINT) AS dl FROM documents"
            "), st AS ("
            "  SELECT CAST(count(*) AS DOUBLE) AS n, "
            "         CAST(sum(dl) AS DOUBLE) AS sdl FROM dl"
            "), toks AS ("
            "  SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "    '[a-z0-9]+')) AS w FROM documents"
            "), qt(query_id, w) AS (VALUES "
            "  (0,'hash'),(0,'join'),(1,'fast'),(1,'scan'),(1,'filter'),"
            "  (2,'window'),(2,'query'),(2,'group')"
            "), tf AS ("
            "  SELECT q.query_id, q.w, t.doc_id, "
            "         CAST(count(*) AS DOUBLE) AS tf "
            "  FROM toks t JOIN qt q ON t.w = q.w "
            "  GROUP BY q.query_id, q.w, t.doc_id"
            "), df AS ("
            "  SELECT w, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df "
            "  FROM tf GROUP BY w"
            "), contrib AS ("
            "  SELECT tf.query_id, tf.doc_id, "
            "    ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0) "
            "      * tf.tf * (1.2 + 1.0) "
            "      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (st.sdl / st.n))) AS c "
            "  FROM tf JOIN df USING (w) JOIN dl ON tf.doc_id = dl.doc_id, st"
            ") "
            "SELECT query_id, doc_id, round(sum(c), 6) AS score "
            "FROM contrib GROUP BY query_id, doc_id "
            "QUALIFY row_number() OVER (PARTITION BY query_id "
            "  ORDER BY round(sum(c), 6) DESC, doc_id) <= 10"
        ),
        # actor-pool classifier: bucket = md5-prefix hex cast to INT
        # (DuckDB '0x' cast == python int(hex,16)); weight = Knuth
        # multiplicative hash of the bucket, exact integer math both sides
        "quality_classifier": (
            "WITH toks AS ("
            "  SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "    '[a-z0-9]+')) AS w FROM documents"
            "), tb AS ("
            "  SELECT doc_id, "
            "    CAST(('0x' || substr(md5(w), 1, 3)) AS BIGINT) AS b "
            "  FROM toks"
            "), wt AS ("
            "  SELECT doc_id, "
            "    ((b * 2654435761) % 4294967296) / 4294967296.0 - 0.5 AS wgt "
            "  FROM tb"
            ") "
            "SELECT doc_id, round(1.0 / (1.0 + exp(-avg(wgt))), 6) AS q_score "
            "FROM wt GROUP BY doc_id"
        ),
        # DSIR: bucket = first 3 hex chars of md5(token) (bit-identical in
        # both engines); Laplace(+1) smoothing over 4096 buckets
        "dsir_weights": (
            "WITH toks AS ("
            "  SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "    '[a-z0-9]+')) AS w FROM documents"
            "), tb AS ("
            "  SELECT t.doc_id, substr(md5(t.w), 1, 3) AS hb, d.lang "
            "  FROM toks t JOIN documents d USING (doc_id)"
            "), hist AS ("
            "  SELECT hb, CAST(count(*) AS DOUBLE) AS c_raw, "
            "    CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE) AS c_tgt "
            "  FROM tb GROUP BY hb"
            "), tot AS ("
            "  SELECT sum(c_raw) AS rn, sum(c_tgt) AS tn FROM hist"
            "), ratio AS ("
            "  SELECT hb, ln(((c_tgt + 1.0) / (tn + 4096.0)) "
            "             / ((c_raw + 1.0) / (rn + 4096.0))) AS lr "
            "  FROM hist, tot"
            ") "
            "SELECT tb.doc_id, round(avg(r.lr), 6) AS weight "
            "FROM tb JOIN ratio r USING (hb) GROUP BY tb.doc_id"
        ),
        "google_distance": (
            "WITH core AS (SELECT p_partkey FROM part WHERE p_size >= 40), "
            "e AS (SELECT DISTINCT l_orderkey AS s, l_partkey AS d FROM lineitem "
            "      JOIN core ON l_partkey = p_partkey), "
            "sz AS (SELECT d, count(*) AS n FROM e GROUP BY d), "
            "tot AS (SELECT count(DISTINCT l_orderkey) AS t FROM lineitem), "
            "inter AS (SELECT a.d AS u, b.d AS v, count(*) AS i FROM e a "
            "          JOIN e b ON a.s = b.s AND a.d < b.d GROUP BY 1, 2) "
            "SELECT u AS a, v AS b, "
            "round((log2(greatest(sa.n, sb.n)) - log2(i)) / "
            "      (log2(t) - log2(least(sa.n, sb.n))), 6) AS distance "
            "FROM inter JOIN sz sa ON u = sa.d JOIN sz sb ON v = sb.d, tot"
        ),
        # exact 2-hop neighborhood sizes on the undirected chain graph
        "two_hop_sizes_chain": (
            "WITH th AS (SELECT l_orderkey, l_linenumber, l_partkey "
            "            FROM lineitem WHERE l_orderkey % 16 = 0), "
            "e0 AS (SELECT l_partkey AS src, "
            "       lead(l_partkey) OVER (PARTITION BY l_orderkey "
            "                             ORDER BY l_linenumber, l_partkey) "
            "       AS dst "
            "       FROM th), "
            "und AS (SELECT DISTINCT LEAST(src, dst) AS u, "
            "               GREATEST(src, dst) AS v FROM e0 "
            "        WHERE dst IS NOT NULL AND src <> dst), "
            "e AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und), "
            "two AS (SELECT a.u AS id, b.v AS nb FROM e a "
            "        JOIN e b ON a.v = b.u WHERE a.u <> b.v "
            "        UNION "
            "        SELECT u AS id, v AS nb FROM e) "
            "SELECT id, COUNT(*) AS n_within_2 FROM two GROUP BY id"
        ),
        "chain_reciprocity": (
            "WITH th AS (SELECT l_orderkey, l_linenumber, l_partkey "
            "            FROM lineitem WHERE l_orderkey % 16 = 0), "
            "e0 AS (SELECT l_partkey AS src, "
            "              lead(l_partkey) OVER (PARTITION BY l_orderkey "
            "                                    ORDER BY l_linenumber, "
            "                                    l_partkey) AS dst "
            "       FROM th), "
            "e AS (SELECT DISTINCT src, dst FROM e0 "
            "      WHERE dst IS NOT NULL AND src <> dst), "
            "ne AS (SELECT count(*) AS n_edges FROM e), "
            "r AS (SELECT count(*) AS n_reciprocal FROM e a "
            "      JOIN e b ON a.src = b.dst AND a.dst = b.src) "
            "SELECT ne.n_edges, r.n_reciprocal, "
            "round(r.n_reciprocal * 1.0 / ne.n_edges, 6) AS reciprocity "
            "FROM ne, r"
        ),
        "collapse_nation_brand": (
            "SELECT n_name, p_brand, count(*) AS n_links, "
            "count(DISTINCT l_orderkey) AS n_src "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "JOIN part ON p_partkey = l_partkey "
            "GROUP BY 1, 2"
        ),
        "token_counts": (
            "SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens "
            "FROM documents"
        ),
        # non-overlapping left-to-right occurrence counts via replace()
        # arithmetic — identical semantics to pyarrow count_substring
        "keyword_tags": (
            "WITH kw AS (SELECT * FROM (VALUES ('hash join'), ('sort merge'), "
            "('window agg'), ('stream'), ('vector')) AS v(keyword)), "
            "c AS (SELECT d.doc_id, kw.keyword, "
            "  (len(d.text) - len(replace(d.text, kw.keyword, ''))) "
            "    // len(kw.keyword) AS n "
            "  FROM documents d CROSS JOIN kw) "
            "SELECT doc_id, keyword, n FROM c WHERE n > 0"
        ),
        "pack_offsets": (
            "WITH t AS (SELECT doc_id, "
            "  len(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents), "
            "o AS (SELECT doc_id, n_tokens, "
            "  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
            "    AS start_pos "
            "  FROM t) "
            "SELECT doc_id, n_tokens, start_pos, "
            "  start_pos + n_tokens AS end_pos, "
            "  start_pos // 2048 AS first_seq, "
            "  (start_pos + n_tokens - 1) // 2048 AS last_seq "
            "FROM o"
        ),
        "quality_scores": (
            "SELECT doc_id, length(text) AS chars, "
            "len(regexp_extract_all(text, '\\S+')) AS tokens, "
            "round(len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / "
            "      greatest(length(text), 1), 6) AS punct_ratio, "
            "round(len(regexp_extract_all(text, '[A-Z]')) * 1.0 / "
            "      greatest(length(text), 1), 6) AS upper_ratio "
            "FROM documents"
        ),
        "fingerprints": (
            "SELECT doc_id, md5(text) AS fingerprint FROM documents"
        ),
        "unigram_logprob": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "  '[a-z0-9]+')) AS tok FROM documents), "
            "tot AS (SELECT count(*) AS n FROM toks), "
            "cnts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok) "
            "SELECT t.doc_id, round(avg(log2(c * 1.0 / n)), 6) AS logprob "
            "FROM toks t JOIN cnts USING (tok), tot GROUP BY t.doc_id"
        ),
        "exact_dedup": (
            "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        "ngram_jaccard_pairs": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "              '[a-z0-9]+') AS ws FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, unnest([ws[i] || ' ' || ws[i+1] "
            "  || ' ' || ws[i+2] for i in generate_series(1, "
            "  greatest(len(ws) - 2, 0))]) AS g FROM toks), "
            "sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1), "
            "inter AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i "
            "  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id "
            "  GROUP BY 1, 2) "
            "SELECT u AS doc_a, v AS doc_b, "
            "round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard "
            "FROM inter JOIN sz sa ON u = sa.doc_id JOIN sz sb ON v = sb.doc_id "
            "WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.2"
        ),
        # CAST to BIGINT: DuckDB sum(int)+1 yields HUGEINT (decimal128 in
        # Arrow), which hash-mismatches the engine's int64 even when every
        # value is identical (round-1 red row).
        "events_sessionize": (
            "WITH o AS (SELECT user_id, CASE WHEN ts - lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS new_s FROM events) "
            "SELECT user_id, CAST(sum(new_s) + 1 AS BIGINT) AS n_sessions, "
            "count(*) AS n_events FROM o GROUP BY user_id"
        ),
        "embedding_dedup_keep": (
            "WITH flat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
            "     CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings), "
            "norms AS (SELECT vec_id, sqrt(sum(x*x)) AS n FROM flat GROUP BY 1), "
            "dropped AS (SELECT DISTINCT b.vec_id AS v FROM flat a "
            "  JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id "
            "  JOIN norms na ON a.vec_id = na.vec_id "
            "  JOIN norms nb ON b.vec_id = nb.vec_id "
            "  GROUP BY a.vec_id, b.vec_id, na.n, nb.n "
            "  HAVING sum(a.x*b.x) / (na.n * nb.n) >= 0.35) "
            "SELECT vec_id FROM embeddings WHERE vec_id NOT IN (SELECT v FROM dropped)"
        ),
        "events_asof_orders": (
            "SELECT event_id, user_id, o_orderkey AS last_orderkey FROM ("
            "  SELECT e.event_id, e.user_id, o.o_orderkey, "
            "    row_number() OVER (PARTITION BY e.event_id "
            "      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn "
            "  FROM events e JOIN orders o ON o.o_custkey = e.user_id "
            "  WHERE o.o_orderdate <= e.ts) WHERE rn = 1"
        ),
        # exact cents accumulation (same rationale as pricing_summary)
        "events_hopping_window": (
            "SELECT user_id, window_start, count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 "
            "  AS sum_value FROM ("
            "  SELECT user_id, value, "
            "    date_trunc('day', ts) - (d * INTERVAL 1 DAY) AS window_start "
            "  FROM events CROSS JOIN generate_series(0, 6) AS g(d)) "
            "GROUP BY 1, 2"
        ),
        "events_range_pairs": (
            "SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE"
        ),
        "top_orders_per_segment": (
            "SELECT c_mktsegment, o_orderkey, o_totalprice FROM ("
            "  SELECT c_mktsegment, o_orderkey, o_totalprice, "
            "    row_number() OVER (PARTITION BY c_mktsegment "
            "      ORDER BY o_totalprice DESC, o_orderkey) AS rn "
            "  FROM orders JOIN customer ON o_custkey = c_custkey) "
            "WHERE rn <= 5"
        ),
        "customers_no_orders": (
            "SELECT c_custkey, c_mktsegment FROM customer "
            "WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)"
        ),
        # exact cents accumulation -> bit-stable cumulative sums
        "events_running_total": (
            "SELECT event_id, user_id, "
            "CAST(count(*) OVER w AS BIGINT) AS n_so_far, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100 "
            "  AS cum_value FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS UNBOUNDED PRECEDING)"
        ),
        # cosine in explicit DOUBLE math: DuckDB's list_cosine_similarity
        # computes in float32 and drifts ~1e-6 from the engine's float64
        "ann_topk": (
            "WITH flat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
            "     CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings), "
            "norms AS (SELECT vec_id, sqrt(sum(x*x)) AS n FROM flat GROUP BY 1), "
            "dots AS (SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x*b.x) AS d "
            "  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < 10 "
            "  AND b.vec_id <> a.vec_id GROUP BY 1, 2), "
            "s AS (SELECT qid, cid, round(d / (na.n * nb.n), 6) AS sim "
            "  FROM dots JOIN norms na ON qid = na.vec_id "
            "  JOIN norms nb ON cid = nb.vec_id) "
            "SELECT qid AS query_id, cid AS vec_id, sim FROM s "
            "QUALIFY row_number() OVER (PARTITION BY qid "
            "  ORDER BY sim DESC, cid) <= 5"
        ),
        # deterministic content-hash sample: membership is a pure function
        # of md5(text), identical on both sides
        "hash_sample": (
            "SELECT doc_id, lang FROM documents "
            "WHERE substr(md5(text), 1, 1) IN ('0', '1', '2', '3')"
        ),
        # CASTs: DuckDB sum(BIGINT) yields HUGEINT (decimal128 in Arrow),
        # which hash-mismatches int64 even at identical values
        "source_stats": (
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs "
            "FROM documents GROUP BY source"
        ),
        "bpe_pair_counts": (
            "WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') "
            "  AS ws FROM documents), "
            "pairs AS (SELECT unnest([ws[i] || ' ' || ws[i+1] "
            "  for i in generate_series(1, greatest(len(ws) - 1, 0))]) AS pair "
            "  FROM toks) "
            "SELECT pair, count(*) AS n FROM pairs GROUP BY pair "
            "ORDER BY n DESC, pair LIMIT 20"
        ),
        "token_df": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "  '[a-z0-9]+')) AS token FROM documents) "
            "SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, "
            "count(*) AS cf FROM toks GROUP BY token "
            "HAVING count(DISTINCT doc_id) >= 5"
        ),
        "tfidf_top_terms": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "  '[a-z0-9]+')) AS token FROM documents), "
            "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2), "
            "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks "
            "       GROUP BY token), "
            "n AS (SELECT count(*) AS nd FROM documents), "
            "s AS (SELECT doc_id, token, "
            "      tf * log2(nd * 1.0 / df) AS score FROM tf "
            "      JOIN df USING (token), n) "
            "SELECT doc_id, token, round(score, 6) AS score FROM s "
            "QUALIFY row_number() OVER (PARTITION BY doc_id "
            "  ORDER BY score DESC, token) <= 3"
        ),
        "stratified_sample": (
            "SELECT doc_id, source FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY source "
            "  ORDER BY md5(text), doc_id) <= 10"
        ),
        # the full curation composition in one statement, mirroring the
        # Ray dataflow stage by stage (quality filter, min-doc_id-per-text
        # exact-dup survivors, near-dup non-survivor drop via the same
        # recursive CC closure, 8-gram benchmark decontamination, md5
        # hash-shard + within-shard rank)
        "curation_pipeline": (
            "WITH RECURSIVE "
            "q AS (SELECT doc_id, md5(text) AS fp FROM documents "
            "  WHERE n_chars >= 200 AND lang IN ('en', 'fr')), "
            "ed AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) "
            "  AS keep_id FROM documents), "
            "toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "  '[a-z0-9]+') AS ws FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, unnest([ws[i] || ' ' || ws[i+1] "
            "  || ' ' || ws[i+2] for i in generate_series(1, "
            "  greatest(len(ws) - 2, 0))]) AS g FROM toks), "
            "sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1), "
            "inter AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i "
            "  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id "
            "  GROUP BY 1, 2), "
            "p AS (SELECT u, v FROM inter "
            "  JOIN sz sa ON u = sa.doc_id JOIN sz sb ON v = sb.doc_id "
            "  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.2), "
            "e AS (SELECT u AS a, v AS b FROM p UNION SELECT v, u FROM p), "
            "reach AS (SELECT a, b FROM e "
            "  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a), "
            "lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id "
            "  FROM reach GROUP BY a), "
            "nd_drop AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id), "
            "ct AS (SELECT doc_id, md5(text) AS cfp, "
            "  regexp_extract_all(lower(text), '[a-z0-9]+') AS ws "
            "  FROM documents), "
            "cg AS (SELECT DISTINCT doc_id, cfp, "
            "  unnest([array_to_string(ws[i:i+7], ' ') for i in "
            "  generate_series(1, greatest(len(ws) - 7, 0))]) AS g FROM ct), "
            "bench AS (SELECT DISTINCT g FROM cg WHERE cfp LIKE 'f%'), "
            "cont AS (SELECT DISTINCT doc_id FROM cg JOIN bench USING (g) "
            "  WHERE cfp NOT LIKE 'f%'), "
            "kept AS (SELECT q.doc_id, q.fp FROM q JOIN ed ON q.doc_id = ed.doc_id "
            "  WHERE ed.keep_id = ed.doc_id "
            "  AND q.doc_id NOT IN (SELECT doc_id FROM nd_drop) "
            "  AND q.doc_id NOT IN (SELECT doc_id FROM cont)) "
            "SELECT substr(fp, 1, 1) AS shard, row_number() OVER "
            "  (PARTITION BY substr(fp, 1, 1) ORDER BY fp, doc_id) AS pos, "
            "doc_id FROM kept"
        ),
        "token_entropy_per_source": (
            "WITH toks AS (SELECT source, unnest(regexp_extract_all(lower(text), "
            "  '[a-z0-9]+')) AS tok FROM documents), "
            "c AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2), "
            "s AS (SELECT source, sum(c) AS t, sum(c * log2(c)) AS sc "
            "  FROM c GROUP BY source) "
            "SELECT source, round(log2(t) - sc / t, 6) AS token_entropy FROM s"
        ),
        "chars_quantiles_per_source": (
            "WITH s AS (SELECT source, n_chars AS v, row_number() OVER "
            "  (PARTITION BY source ORDER BY n_chars) AS rn, "
            "  count(*) OVER (PARTITION BY source) AS n FROM documents), "
            "qv(q) AS (VALUES (0.25), (0.5), (0.75)) "
            "SELECT source, CAST(q AS DOUBLE) AS q, CAST(v AS BIGINT) AS value "
            "FROM qv JOIN s ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))"
        ),
        # even-suffix sources weight 1.0, odd 0.25 (md5 first digit < '4');
        # shard = md5 first digit, pos = rank within shard by (md5, doc_id)
        "training_mix": (
            "WITH kept AS (SELECT doc_id, md5(text) AS fp FROM documents "
            "  WHERE CAST(substr(source, 4) AS INT) % 2 = 0 "
            "     OR substr(md5(text), 1, 1) < '4') "
            "SELECT substr(fp, 1, 1) AS shard, "
            "row_number() OVER (PARTITION BY substr(fp, 1, 1) "
            "  ORDER BY fp, doc_id) AS pos, doc_id FROM kept"
        ),
        # min over md5 of word-8-gram windows; whole doc when shorter
        "winnow_fingerprints": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "  '[a-z0-9]+') AS ws FROM documents), "
            "w AS (SELECT doc_id, unnest([array_to_string(ws[i:i+7], ' ') "
            "  for i in generate_series(1, greatest(len(ws) - 7, 0))]) AS win "
            "  FROM toks), "
            "short AS (SELECT doc_id, array_to_string(ws, ' ') AS win "
            "  FROM toks WHERE len(ws) BETWEEN 1 AND 7), "
            "allw AS (SELECT * FROM w UNION ALL SELECT * FROM short) "
            "SELECT doc_id, min(md5(win)) AS win_fp FROM allw GROUP BY doc_id"
        ),
        # dup_frac = tokens covered by any word-10-gram occurring >= 2
        # times corpus-wide (within-doc repeats count), over n_tokens
        "dup_span_fraction": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "  '[a-z0-9]+') AS ts FROM documents), "
            "wi AS (SELECT doc_id, ts, unnest(range(1, "
            "  greatest(len(ts) - 9, 0) + 1)) AS i FROM toks), "
            "w AS (SELECT doc_id, i, array_to_string(ts[i:i+9], ' ') AS win "
            "  FROM wi), "
            "dup AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2), "
            "cov AS (SELECT DISTINCT doc_id, i + unnest(range(0, 10)) AS p "
            "  FROM w JOIN dup USING (win)), "
            "agg AS (SELECT doc_id, count(*) AS c FROM cov GROUP BY doc_id), "
            "n AS (SELECT doc_id, len(ts) AS n_tokens FROM toks "
            "  WHERE len(ts) > 0) "
            "SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens, "
            "round(CAST(coalesce(agg.c, 0) AS DOUBLE) / n.n_tokens, 6) "
            "AS dup_frac FROM n LEFT JOIN agg USING (doc_id)"
        ),
        # 1-NN by round(cos,6) with id tie-break (ann_topk's ranking rule)
        "knn_label_accuracy": (
            "WITH flat AS (SELECT vec_id, generate_subscripts(embedding, 1) "
            "  AS i, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings), "
            "norms AS (SELECT vec_id, sqrt(sum(x*x)) AS n FROM flat GROUP BY 1), "
            "dots AS (SELECT a.vec_id AS qid, b.vec_id AS cid, "
            "  sum((a.x / na.n) * (b.x / nb.n)) AS sim "
            "  FROM flat a JOIN flat b ON a.i = b.i AND b.vec_id <> a.vec_id "
            "  JOIN norms na ON a.vec_id = na.vec_id "
            "  JOIN norms nb ON b.vec_id = nb.vec_id GROUP BY 1, 2), "
            "nn AS (SELECT qid, cid FROM (SELECT qid, cid, round(sim, 6) "
            "  AS s FROM dots) QUALIFY row_number() OVER (PARTITION BY qid "
            "  ORDER BY s DESC, cid) = 1), "
            "lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label "
            "  FROM embeddings) "
            "SELECT lq.label, count(*) AS n, "
            "CAST(sum(CASE WHEN lq.label = lc.label THEN 1 ELSE 0 END) "
            "  AS BIGINT) AS n_correct, "
            "round(sum(CASE WHEN lq.label = lc.label THEN 1 ELSE 0 END) "
            "  * 1.0 / count(*), 6) AS accuracy "
            "FROM nn JOIN lab lq ON nn.qid = lq.vec_id "
            "JOIN lab lc ON nn.cid = lc.vec_id GROUP BY lq.label"
        ),
        # discounted revenue per supplier region, exact scaled-int64 sums
        "supplier_region_revenue": (
            "SELECT r_name, count(*) AS n_items, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "         (100 - CAST(round(l_discount * 100) AS BIGINT))) "
            "  AS DOUBLE) / 10000 AS revenue "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        # per-doc mean log2 c(a,b)/c(a,.) over adjacent token pairs
        "bigram_logprob": _BIGRAM_LL_ORACLE,
        # CCNet-style per-source head/middle/tail tertiles of the bigram
        # LM score; quantile_disc = the rank-ceil(q*n) order statistic
        # grouped_exact_quantiles reproduces, q literals IEEE-identical
        "ppl_buckets": (
            f"WITH ll AS ({_BIGRAM_LL_ORACLE}), "
            "r AS (SELECT d.source, "
            "  CAST(round(ll.logprob * 1000000) AS BIGINT) AS r "
            "  FROM ll JOIN documents d USING (doc_id)), "
            "b AS (SELECT source, "
            f"  quantile_disc(r, {1.0 / 3.0!r}) AS q1, "
            f"  quantile_disc(r, {2.0 / 3.0!r}) AS q2 "
            "  FROM r GROUP BY source) "
            "SELECT r.source, "
            "(CASE WHEN r.r > b.q2 THEN 2 WHEN r.r > b.q1 THEN 1 "
            "  ELSE 0 END) AS bucket, "
            "count(*) AS n_docs, "
            "round(sum(r.r) * 1.0 / count(*) / 1000000, 6) AS mean_logprob "
            "FROM r JOIN b USING (source) GROUP BY 1, 2"
        ),
        # pairs of docs sharing a winnow fingerprint (groups of 2..1000)
        "winnow_dup_pairs": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "  '[a-z0-9]+') AS ws FROM documents), "
            "w AS (SELECT doc_id, unnest([array_to_string(ws[i:i+7], ' ') "
            "  for i in generate_series(1, greatest(len(ws) - 7, 0))]) AS win "
            "  FROM toks), "
            "short AS (SELECT doc_id, array_to_string(ws, ' ') AS win "
            "  FROM toks WHERE len(ws) BETWEEN 1 AND 7), "
            "allw AS (SELECT * FROM w UNION ALL SELECT * FROM short), "
            "fp AS (SELECT doc_id, min(md5(win)) AS win_fp FROM allw "
            "  GROUP BY doc_id), "
            "sized AS (SELECT doc_id, win_fp, count(*) OVER "
            "  (PARTITION BY win_fp) AS n FROM fp) "
            "SELECT x.doc_id AS a, y.doc_id AS b FROM sized x "
            "JOIN sized y ON x.win_fp = y.win_fp AND x.doc_id < y.doc_id "
            "WHERE x.n BETWEEN 2 AND 1000"
        ),
        # JSON k extracted by the same regex on both sides; int64 sums
        "events_props_stats": (
            "SELECT event_type, count(*) AS n_events, "
            "CAST(sum(CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) "
            "  AS BIGINT)) AS BIGINT) AS sum_k, "
            "min(CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) "
            "  AS BIGINT)) AS min_k, "
            "max(CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) "
            "  AS BIGINT)) AS max_k "
            "FROM events GROUP BY 1"
        ),
        # percent_rank = (strictly smaller)/(n-1) per source; keep >= 0.75
        "chars_percentile_filter": (
            "SELECT doc_id, source, n_chars, pr FROM ("
            "  SELECT doc_id, source, n_chars, "
            "    round(percent_rank() OVER (PARTITION BY source "
            "      ORDER BY n_chars), 6) AS pr FROM documents) "
            "WHERE pr >= 0.75"
        ),
        # Gopher rule inputs + keep flag; identical formulas/round both
        # sides (comparisons on the round-6 values)
        "gopher_rules": (
            "SELECT doc_id, n_words, mean_word_len, frac_bullet_lines, "
            "frac_ellipsis_lines, stop_hits, "
            "CAST(n_words BETWEEN 30 AND 90 "
            "  AND mean_word_len BETWEEN 3.0 AND 10.0 "
            "  AND frac_bullet_lines <= 0.9 AND frac_ellipsis_lines <= 0.3 "
            "  AND stop_hits >= 2 AS BIGINT) AS keep FROM ("
            "SELECT doc_id, "
            "  len(regexp_extract_all(text, '\\S+')) AS n_words, "
            "  round(len(regexp_extract_all(text, '\\S')) * 1.0 / "
            "    greatest(len(regexp_extract_all(text, '\\S+')), 1), 6) "
            "    AS mean_word_len, "
            "  round(len(regexp_extract_all(text, '(?m)^[\\-\\*]')) * 1.0 / "
            "    (length(text) - length(replace(text, chr(10), '')) + 1), 6) "
            "    AS frac_bullet_lines, "
            "  round(len(regexp_extract_all(text, '(?m)\\.\\.\\.$')) * 1.0 / "
            "    (length(text) - length(replace(text, chr(10), '')) + 1), 6) "
            "    AS frac_ellipsis_lines, "
            "  CAST(regexp_matches(lower(text), '\\bthe\\b') AS BIGINT) + "
            "  CAST(regexp_matches(lower(text), '\\ba\\b') AS BIGINT) + "
            "  CAST(regexp_matches(lower(text), '\\band\\b') AS BIGINT) + "
            "  CAST(regexp_matches(lower(text), '\\bof\\b') AS BIGINT) + "
            "  CAST(regexp_matches(lower(text), '\\bto\\b') AS BIGINT) "
            "    AS stop_hits "
            "FROM documents)"
        ),
        # rep_ratio = 1 - distinct/total word-2-grams; 0 for docs too short
        "repetition_scores": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "  '[a-z0-9]+') AS ws FROM documents), "
            "g AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in "
            "  generate_series(1, greatest(len(ws) - 1, 0))]) AS g FROM toks), "
            "agg AS (SELECT doc_id, count(*) AS total, count(DISTINCT g) AS d "
            "  FROM g GROUP BY doc_id) "
            "SELECT t.doc_id, round(coalesce(1 - a.d * 1.0 / a.total, 0), 6) "
            "AS rep_ratio FROM toks t LEFT JOIN agg a USING (doc_id)"
        ),
        # benchmark = docs with md5(text) LIKE 'f%'; contamination = corpus
        # docs sharing >= 1 distinct word-8-gram with any benchmark doc
        "benchmark_contamination": (
            "WITH toks AS (SELECT doc_id, md5(text) AS fp, "
            "  regexp_extract_all(lower(text), '[a-z0-9]+') AS ws "
            "  FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, fp, "
            "  unnest([array_to_string(ws[i:i+7], ' ') for i in "
            "  generate_series(1, greatest(len(ws) - 7, 0))]) AS g FROM toks), "
            "bench AS (SELECT DISTINCT g FROM grams WHERE fp LIKE 'f%') "
            "SELECT doc_id, count(*) AS n_shared FROM grams JOIN bench USING (g) "
            "WHERE fp NOT LIKE 'f%' GROUP BY doc_id"
        ),
        # both sides round pmi to 6 decimals BEFORE the (pmi desc, pair) sort
        "pmi_top_pairs": (
            "WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') "
            "  AS ws FROM documents), "
            "pr AS (SELECT unnest([ws[i] || ' ' || ws[i+1] for i in "
            "  generate_series(1, greatest(len(ws) - 1, 0))]) AS pair FROM toks), "
            "pc AS (SELECT pair, count(*) AS n FROM pr GROUP BY pair), "
            "tp AS (SELECT count(*) AS t FROM pr), "
            "un AS (SELECT unnest(ws) AS token FROM toks), "
            "uc AS (SELECT token, count(*) AS c FROM un GROUP BY token), "
            "tt AS (SELECT count(*) AS t FROM un), "
            "s AS (SELECT pair, n, round(log2((n * 1.0 / tp.t) / "
            "  ((ca.c * 1.0 / tt.t) * (cb.c * 1.0 / tt.t))), 6) AS pmi "
            "  FROM pc JOIN uc ca ON split_part(pair, ' ', 1) = ca.token "
            "  JOIN uc cb ON split_part(pair, ' ', 2) = cb.token, tp, tt "
            "  WHERE n >= 5) "
            "SELECT pair, n, pmi FROM s ORDER BY pmi DESC, pair LIMIT 30"
        ),
        # connected components over the jaccard-pair graph via recursive
        # transitive closure (tiny pair graph at oracle scale); cluster_id =
        # min doc_id reachable, matching the hash-min superstep fixpoint
        "near_dup_clusters": (
            _NEARDUP_LAB_CTE +
            "SELECT doc_id, cluster_id, doc_id = cluster_id AS keep FROM lab"
        ),
        # alternate survivor policy: keep the LONGEST doc per cluster
        "near_dup_keep_longest": (
            _NEARDUP_LAB_CTE +
            "SELECT lab.doc_id, cluster_id, row_number() OVER ("
            "  PARTITION BY cluster_id "
            "  ORDER BY d.n_chars DESC, lab.doc_id) = 1 AS keep "
            "FROM lab JOIN documents d ON d.doc_id = lab.doc_id"
        ),
        # rank-ceil(q*n) quantile, made explicit so both sides share one
        # unambiguous definition (quantile_disc interpolation varies)
        "price_quantiles": (
            "WITH s AS (SELECT l_extendedprice AS v, row_number() OVER "
            "  (ORDER BY l_extendedprice) AS rn, count(*) OVER () AS n "
            "  FROM lineitem), "
            "qv(q) AS (VALUES (0.01), (0.25), (0.5), (0.75), (0.99)) "
            "SELECT CAST(q AS DOUBLE) AS q, v AS value FROM qv JOIN s "
            "ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))"
        ),
        "cosine_pairs": (
            "WITH flat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
            "     CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings), "
            "norms AS (SELECT vec_id, sqrt(sum(x*x)) AS n FROM flat GROUP BY 1), "
            "dots AS (SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.x*b.x) AS d "
            "  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id "
            "  GROUP BY 1, 2) "
            "SELECT va AS vec_a, vb AS vec_b, round(d / (na.n * nb.n), 6) AS sim "
            "FROM dots JOIN norms na ON va = na.vec_id "
            "JOIN norms nb ON vb = nb.vec_id "
            "WHERE d / (na.n * nb.n) >= 0.35"
        ),
        "simple_filter_revenue": (
            "SELECT round(CAST(COALESCE(sum("
            "  CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "  CAST(round(l_discount * 100) AS BIGINT)), 0) AS DOUBLE) "
            "  / 10000, 6) AS revenue, count(*) AS n_items "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 24"
        ),
        "profit_by_nation_year": (
            "SELECT n_name AS nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS o_year, "
            "round(CAST(sum("
            "  CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "  (100 - CAST(round(l_discount * 100) AS BIGINT)) - "
            "  CAST(round(p_retailprice * 100) AS BIGINT) * "
            "  CAST(round(l_quantity) AS BIGINT) * 100) AS DOUBLE) "
            "  / 10000, 6) AS sum_profit "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "WHERE p_name LIKE '%widget%' GROUP BY 1, 2"
        ),
        "supplier_cnt_by_part": (
            "SELECT p_brand, p_size, "
            "count(DISTINCT l_suppkey) AS supplier_cnt "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE p_brand <> 'Brand#1' AND p_size <= 25 GROUP BY 1, 2"
        ),
        "excess_suppliers": (
            "WITH m AS (SELECT l_suppkey, l_shipdate, "
            "  CAST(round(l_quantity * 100) AS BIGINT) AS q "
            "  FROM lineitem JOIN part ON p_partkey = l_partkey "
            "  WHERE p_name LIKE '%gear%'), "
            "agg AS (SELECT l_suppkey, "
            "  sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' "
            "    AND l_shipdate < TIMESTAMP '1997-01-01' THEN q ELSE 0 END) "
            "    AS qty_year, "
            "  sum(q) AS qty_all, "
            "  count(DISTINCT year(l_shipdate)) AS n_years "
            "  FROM m GROUP BY l_suppkey) "
            "SELECT s_name, n_name FROM agg "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "WHERE CAST(qty_year AS DOUBLE) > "
            "1.1 * (CAST(qty_all AS DOUBLE) / CAST(n_years AS DOUBLE))"
        ),
        "last_shipper_blame": (
            "WITH ps AS (SELECT l_orderkey, l_suppkey, "
            "  max(l_shipdate) AS sd FROM lineitem "
            "  JOIN orders ON o_orderkey = l_orderkey "
            "  WHERE o_orderstatus = 'F' GROUP BY 1, 2), "
            "w AS (SELECT l_orderkey, l_suppkey, sd, "
            "  max(sd) OVER (PARTITION BY l_orderkey) AS omax, "
            "  count(*) OVER (PARTITION BY l_orderkey) AS nsupp FROM ps), "
            "v AS (SELECT *, sum(CASE WHEN sd = omax THEN 1 ELSE 0 END) "
            "  OVER (PARTITION BY l_orderkey) AS natmax FROM w), "
            "cnt AS (SELECT l_suppkey, count(*) AS numwait FROM v "
            "  WHERE nsupp >= 2 AND sd = omax AND natmax = 1 "
            "  GROUP BY l_suppkey) "
            "SELECT s_name, numwait FROM cnt "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "ORDER BY numwait DESC, l_suppkey LIMIT 50"
        ),
        "attribution_revenue": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, value, "
            "  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id "
            "  ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "  THEN 1 ELSE 0 END AS new_s FROM events), "
            "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
            "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess "
            "  FROM o), "
            "f AS (SELECT user_id, sess, event_type AS first_type FROM ("
            "  SELECT user_id, sess, event_type, row_number() OVER ("
            "  PARTITION BY user_id, sess ORDER BY ts, event_id) AS rn "
            "  FROM s) WHERE rn = 1), "
            "p AS (SELECT user_id, sess, "
            "  sum(CAST(round(value * 100) AS BIGINT)) AS v, "
            "  count(*) AS np FROM s WHERE event_type = 'purchase' "
            "  GROUP BY 1, 2) "
            "SELECT first_type AS event_type, "
            "round(CAST(COALESCE(sum(v), 0) AS DOUBLE) / 100, 6) "
            "  AS attributed_value, "
            "CAST(COALESCE(sum(np), 0) AS BIGINT) AS n_purchases "
            "FROM f LEFT JOIN p USING (user_id, sess) GROUP BY 1"
        ),
        "event_daily_anomaly": (
            "WITH d AS (SELECT event_type, "
            "  CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*) AS cnt "
            "  FROM events GROUP BY 1, 2), "
            # exact integer moments (order-independent), one float
            # expression tree mirrored by the pipeline term-for-term
            "s AS (SELECT event_type, count(*) AS n, sum(cnt) AS s1, "
            "  sum(cnt * cnt) AS q FROM d GROUP BY 1), "
            "s2 AS (SELECT event_type, n, "
            "  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu, "
            "  (CAST(q AS DOUBLE) - CAST(s1 AS DOUBLE) "
            "    * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) "
            "    / CAST(n - 1 AS DOUBLE) AS var FROM s WHERE n >= 2) "
            "SELECT d.event_type, day, cnt, "
            "round((CAST(cnt AS DOUBLE) - mu) / sqrt(var), 6) AS z "
            "FROM d JOIN s2 ON d.event_type = s2.event_type "
            "WHERE var > 0 "
            "AND abs((CAST(cnt AS DOUBLE) - mu) / sqrt(var)) > 2"
        ),
        "readability_scores": (
            "SELECT doc_id, n_words, n_sentences, n_syllables, "
            "round(206.835 - 1.015 * (CAST(greatest(n_words, 1) AS DOUBLE) "
            "  / CAST(greatest(n_sentences, 1) AS DOUBLE)) "
            "  - 84.6 * (CAST(n_syllables AS DOUBLE) "
            "  / CAST(greatest(n_words, 1) AS DOUBLE)), 6) AS flesch "
            "FROM (SELECT doc_id, "
            "  len(regexp_extract_all(text, '\\S+')) AS n_words, "
            "  len(regexp_extract_all(text, '[.!?]+')) AS n_sentences, "
            "  len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS n_syllables "
            "  FROM documents)"
        ),
        "local_bridges": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "  FROM lineitem a JOIN lineitem b "
            "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), "
            "und AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e) "
            "SELECT u, v FROM e WHERE NOT EXISTS ("
            "  SELECT 1 FROM und n1 JOIN und n2 "
            "  ON n2.x = e.v AND n2.y = n1.y WHERE n1.x = e.u)"
        ),
        "lang_fertility": (
            "WITH t AS (SELECT lang, "
            "  len(regexp_extract_all(text, '\\S+')) AS nt, "
            "  length(text) AS nc FROM documents) "
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(nt) AS BIGINT) AS total_tokens, "
            "round(CAST(sum(nc) AS DOUBLE) / "
            "  CAST(greatest(sum(nt), 1) AS DOUBLE), 6) AS chars_per_token "
            "FROM t GROUP BY lang"
        ),
        "time_to_conversion": (
            "WITH su AS (SELECT user_id, min(ts) AS ts_signup FROM events "
            "  WHERE event_type = 'signup' GROUP BY 1), "
            "conv AS (SELECT e.user_id, min(e.ts) AS ts_conv "
            "  FROM events e JOIN su USING (user_id) "
            "  WHERE e.event_type = 'purchase' AND e.ts >= su.ts_signup "
            "  GROUP BY 1), "
            "m AS (SELECT su.user_id, "
            "  date_trunc('week', ts_signup) AS week, ts_signup, ts_conv "
            "  FROM su LEFT JOIN conv USING (user_id)) "
            "SELECT CAST(week AS TIMESTAMP) AS signup_week, "
            "count(*) AS n_users, "
            "CAST(sum(CASE WHEN ts_conv IS NOT NULL THEN 1 ELSE 0 END) "
            "  AS BIGINT) AS n_converted, "
            "round(CASE WHEN sum(CASE WHEN ts_conv IS NOT NULL THEN 1 "
            "  ELSE 0 END) > 0 THEN "
            "  (CAST(sum(CASE WHEN ts_conv IS NOT NULL THEN "
            "    epoch_us(ts_conv) - epoch_us(ts_signup) ELSE 0 END) "
            "    AS DOUBLE) "
            "  / CAST(greatest(sum(CASE WHEN ts_conv IS NOT NULL THEN 1 "
            "    ELSE 0 END), 1) AS DOUBLE)) / 3600000000.0 "
            "  ELSE 0.0 END, 6) AS avg_hours "
            "FROM m GROUP BY 1"
        ),
        "late_events": (
            "WITH w AS (SELECT event_id, ts, max(ts) OVER ("
            "  ORDER BY event_id % 16, event_id ROWS BETWEEN UNBOUNDED "
            "  PRECEDING AND 1 PRECEDING) AS pm FROM events) "
            "SELECT event_id, ts, "
            "round(CAST(epoch_us(pm) - epoch_us(ts) AS DOUBLE) "
            "  / 60000000.0, 6) AS late_minutes "
            "FROM w WHERE pm IS NOT NULL "
            "AND epoch_us(pm) - epoch_us(ts) > 600000000"
        ),
        "label_centroid_dists": (
            "WITH flat AS (SELECT label, "
            "  generate_subscripts(embedding, 1) AS i, "
            "  CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings), "
            "c AS (SELECT label, i, avg(x) AS m FROM flat GROUP BY 1, 2) "
            "SELECT CAST(a.label AS BIGINT) AS label_a, "
            "CAST(b.label AS BIGINT) AS label_b, "
            "round(sqrt(sum((a.m - b.m) * (a.m - b.m))), 6) AS dist "
            "FROM c a JOIN c b ON a.i = b.i AND a.label < b.label "
            "GROUP BY 1, 2"
        ),
        "rfm_segments": (
            "WITH m AS (SELECT user_id, "
            "  (SELECT epoch_us(max(ts)) FROM events) - epoch_us(max(ts)) "
            "    AS rec, "
            "  count(*) AS freq, "
            "  sum(CAST(round(value * 100) AS BIGINT)) AS mon "
            "  FROM events GROUP BY user_id), "
            "nn AS (SELECT count(*) AS n FROM m), "
            "qv(q) AS (VALUES (0.2), (0.4), (0.6), (0.8)), "
            "rr AS (SELECT rec AS v, row_number() OVER (ORDER BY rec) rn "
            "  FROM m), "
            "rb AS (SELECT q, v FROM qv, nn JOIN rr "
            "  ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))), "
            "ff AS (SELECT freq AS v, row_number() OVER (ORDER BY freq) rn "
            "  FROM m), "
            "fb AS (SELECT q, v FROM qv, nn JOIN ff "
            "  ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))), "
            "mm AS (SELECT mon AS v, row_number() OVER (ORDER BY mon) rn "
            "  FROM m), "
            "mb AS (SELECT q, v FROM qv, nn JOIN mm "
            "  ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))), "
            "a AS (SELECT user_id, "
            "  1 + (SELECT count(*) FROM rb WHERE CAST(rb.v AS DOUBLE) "
            "    < CAST(m.rec AS DOUBLE)) AS r_q, "
            "  1 + (SELECT count(*) FROM fb WHERE CAST(fb.v AS DOUBLE) "
            "    < CAST(m.freq AS DOUBLE)) AS f_q, "
            "  1 + (SELECT count(*) FROM mb WHERE CAST(mb.v AS DOUBLE) "
            "    < CAST(m.mon AS DOUBLE)) AS m_q FROM m) "
            "SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q, "
            "CAST(m_q AS BIGINT) AS m_q, count(*) AS n_users "
            "FROM a GROUP BY 1, 2, 3"
        ),
        "returnflag_sequences": (
            "WITH s AS (SELECT l_orderkey, "
            "  string_agg(l_returnflag, '' ORDER BY l_linenumber) AS sig "
            "  FROM lineitem GROUP BY 1), "
            "c AS (SELECT sig, count(*) AS cnt FROM s GROUP BY 1) "
            "SELECT sig, cnt FROM c ORDER BY cnt DESC, sig LIMIT 20"
        ),
        "session_trigrams": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id "
            "  ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "  THEN 1 ELSE 0 END AS new_s FROM events), "
            "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
            "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess "
            "  FROM o), "
            "t AS (SELECT event_type AS t1, "
            "  lead(event_type, 1) OVER w2 AS t2, "
            "  lead(event_type, 2) OVER w2 AS t3 FROM s "
            "  WINDOW w2 AS (PARTITION BY user_id, sess "
            "  ORDER BY ts, event_id)), "
            "c AS (SELECT t1, t2, t3, count(*) AS cnt FROM t "
            "  WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1, 2, 3) "
            "SELECT t1, t2, t3, cnt FROM c "
            "ORDER BY cnt DESC, t1, t2, t3 LIMIT 20"
        ),
        "daily_trend": (
            "WITH d AS (SELECT event_type, "
            "  CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, "
            "  count(*) AS cnt FROM events GROUP BY 1, 2), "
            "m AS (SELECT event_type, "
            "  day - min(day) OVER (PARTITION BY event_type) AS x, "
            "  cnt AS y FROM d), "
            "a AS (SELECT event_type, count(*) AS n, sum(x) AS sx, "
            "  sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx "
            "  FROM m GROUP BY 1) "
            "SELECT event_type, CAST(n AS BIGINT) AS n_days, "
            "round(CAST(n * sxy - sx * sy AS DOUBLE) "
            "  / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope, "
            "round((CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) "
            "  / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) "
            "  / CAST(n AS DOUBLE), 6) AS intercept "
            "FROM a WHERE n * sxx - sx * sx <> 0"
        ),
        "nation_share_of_region": (
            "WITH per AS (SELECT c_nationkey AS nk, "
            "  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "  FROM orders JOIN customer ON c_custkey = o_custkey "
            "  GROUP BY 1) "
            "SELECT r_name, n_name, "
            "round(CAST(rev AS DOUBLE) / 100, 6) AS revenue, "
            "round(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER ("
            "  PARTITION BY n_regionkey) AS DOUBLE), 6) AS share "
            "FROM per JOIN nation ON n_nationkey = nk "
            "JOIN region ON r_regionkey = n_regionkey"
        ),
        "term_burstiness": (
            "WITH toks AS (SELECT source, "
            "  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "  FROM documents), "
            "o AS (SELECT token, source, count(*) AS o FROM toks "
            "  GROUP BY 1, 2), "
            "cf AS (SELECT token, sum(o) AS cf FROM o GROUP BY 1 "
            "  HAVING sum(o) >= 50), "
            "ts AS (SELECT source, count(*) AS t FROM toks GROUP BY 1), "
            "tot AS (SELECT sum(t) AS tt FROM ts), "
            "x AS (SELECT cf.token, cf.cf, sum("
            "  (CAST(COALESCE(o.o, 0) AS DOUBLE) - CAST(cf.cf AS DOUBLE) "
            "    * (CAST(ts.t AS DOUBLE) / CAST(tot.tt AS DOUBLE))) "
            "  * (CAST(COALESCE(o.o, 0) AS DOUBLE) - CAST(cf.cf AS DOUBLE) "
            "    * (CAST(ts.t AS DOUBLE) / CAST(tot.tt AS DOUBLE))) "
            "  / (CAST(cf.cf AS DOUBLE) "
            "    * (CAST(ts.t AS DOUBLE) / CAST(tot.tt AS DOUBLE)))) AS chi2 "
            "  FROM cf CROSS JOIN ts CROSS JOIN tot "
            "  LEFT JOIN o ON o.token = cf.token AND o.source = ts.source "
            "  GROUP BY 1, 2) "
            "SELECT token, CAST(cf AS BIGINT) AS cf, "
            "round(chi2, 6) AS chi2 FROM x "
            "ORDER BY round(chi2, 6) DESC, token LIMIT 30"
        ),
        "peak_concurrent_sessions": (
            "WITH o AS (SELECT user_id, ts, event_id, "
            "  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id "
            "  ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "  THEN 1 ELSE 0 END AS new_s FROM events), "
            "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
            "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess "
            "  FROM o), "
            "b AS (SELECT user_id, sess, min(ts) AS st, max(ts) AS en "
            "  FROM s GROUP BY 1, 2), "
            "p AS (SELECT st AS ts, 1 AS d FROM b "
            "  UNION ALL SELECT en, -1 FROM b), "
            "r AS (SELECT ts, sum(d) OVER (ORDER BY ts, d DESC "
            "  ROWS UNBOUNDED PRECEDING) AS run FROM p) "
            "SELECT CAST(run AS BIGINT) AS peak, ts AS at_ts FROM r "
            "WHERE run = (SELECT max(run) FROM r) ORDER BY ts LIMIT 1"
        ),
        "yearly_rank_stability": (
            "WITH d AS (SELECT l_partkey AS part, "
            "  CAST(year(l_shipdate) AS BIGINT) AS yr, "
            "  count(DISTINCT l_orderkey) AS deg FROM lineitem "
            "  GROUP BY 1, 2), "
            "r AS (SELECT part, yr, row_number() OVER (PARTITION BY yr "
            "  ORDER BY deg DESC, part) AS rank FROM d), "
            "pr AS (SELECT a.yr AS year_a, a.rank AS x, b.rank AS y "
            "  FROM r a JOIN r b ON a.part = b.part AND b.yr = a.yr + 1), "
            "a AS (SELECT year_a, count(*) AS n, sum(x) AS sx, "
            "  sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx, "
            "  sum(y * y) AS syy FROM pr GROUP BY 1) "
            "SELECT year_a, year_a + 1 AS year_b, "
            "CAST(n AS BIGINT) AS n_common, "
            "round(CAST(n * sxy - sx * sy AS DOUBLE) "
            "  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) "
            "  * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS spearman "
            "FROM a WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"
        ),
        "repeat_orders_7d": (
            "WITH p AS (SELECT a.o_custkey AS ck FROM orders a "
            "  JOIN orders b ON a.o_custkey = b.o_custkey "
            "  AND (b.o_orderdate > a.o_orderdate "
            "    OR (b.o_orderdate = a.o_orderdate "
            "        AND b.o_orderkey > a.o_orderkey)) "
            "  AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY) "
            "SELECT count(*) AS n_pairs, "
            "CAST(count(DISTINCT ck) AS BIGINT) AS n_customers FROM p"
        ),
        "props_value_corr": (
            "WITH m AS (SELECT event_type, "
            "  CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT) "
            "    AS x, "
            "  CAST(round(value * 100) AS BIGINT) AS y FROM events), "
            "a AS (SELECT event_type, count(*) AS n, sum(x) AS sx, "
            "  sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx, "
            "  sum(y * y) AS syy FROM m GROUP BY 1) "
            "SELECT event_type, CAST(n AS BIGINT) AS n, "
            "round(CAST(n * sxy - sx * sy AS DOUBLE) "
            "  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) "
            "  * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr "
            "FROM a WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"
        ),
        "weighted_price_quantiles": (
            "WITH b AS (SELECT l_extendedprice AS v, "
            "  CAST(round(l_quantity) AS BIGINT) AS w FROM lineitem), "
            "s AS (SELECT v, sum(w) AS w FROM b GROUP BY v), "
            "o AS (SELECT v, sum(w) OVER (ORDER BY v "
            "  ROWS UNBOUNDED PRECEDING) AS cw FROM s), "
            "tw AS (SELECT CAST(sum(w) AS DOUBLE) AS W FROM b), "
            "qv(q) AS (VALUES (0.25), (0.5), (0.75), (0.9)) "
            "SELECT CAST(q AS DOUBLE) AS q, min(v) AS value "
            "FROM qv, tw, o WHERE CAST(cw AS DOUBLE) >= q * W GROUP BY 1"
        ),
        "latest_event_per_user_type": (
            "SELECT user_id, event_type, event_id, ts, value FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY user_id, "
            "  event_type ORDER BY ts DESC, event_id DESC) AS rn "
            "  FROM events) WHERE rn = 1"
        ),
        "daily_ohlc": (
            "WITH e AS (SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, "
            "  ts, event_id, CAST(round(value * 100) AS BIGINT) AS v "
            "  FROM events), "
            "f AS (SELECT day, v AS open FROM (SELECT *, row_number() "
            "  OVER (PARTITION BY day ORDER BY ts, event_id) AS rn FROM e) "
            "  WHERE rn = 1), "
            "l AS (SELECT day, v AS close FROM (SELECT *, row_number() "
            "  OVER (PARTITION BY day ORDER BY ts DESC, event_id DESC) "
            "  AS rn FROM e) WHERE rn = 1), "
            "a AS (SELECT day, max(v) AS hi, min(v) AS lo, count(*) AS n "
            "  FROM e GROUP BY 1) "
            "SELECT a.day, round(CAST(open AS DOUBLE) / 100, 6) AS open, "
            "round(CAST(hi AS DOUBLE) / 100, 6) AS high, "
            "round(CAST(lo AS DOUBLE) / 100, 6) AS low, "
            "round(CAST(close AS DOUBLE) / 100, 6) AS close, n "
            "FROM a JOIN f ON a.day = f.day JOIN l ON a.day = l.day"
        ),
        "user_event_entropy_hist": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS k "
            "  FROM events GROUP BY 1, 2), "
            "n AS (SELECT user_id, sum(k) AS n FROM c GROUP BY 1), "
            # sum the entropy terms over an ORDER BY'd list so the float
            # summation order (ascending event_type) is pinned to match
            # the pipeline's canonical order — a plain SUM's order is
            # unspecified and could flip a value sitting exactly on a
            # round-6/bin-floor boundary
            "h AS (SELECT c.user_id, round(list_aggregate(list("
            "  -(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) "
            "  * log2(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) "
            "  ORDER BY event_type), 'sum'), 6) AS h "
            "  FROM c JOIN n USING (user_id) GROUP BY 1) "
            "SELECT CAST(CAST(floor(h * 10) AS BIGINT) AS DOUBLE) / 10 "
            "  AS bin_lo, count(*) AS n_users FROM h GROUP BY 1"
        ),
        "winsorized_value_mean": (
            "WITH s AS (SELECT value AS v, "
            "  row_number() OVER (ORDER BY value) AS rn, "
            "  count(*) OVER () AS n FROM events), "
            "qb AS (SELECT "
            "  max(CASE WHEN rn = greatest(1, "
            "    CAST(ceil(0.01 * n) AS BIGINT)) THEN v END) AS lo, "
            "  max(CASE WHEN rn = greatest(1, "
            "    CAST(ceil(0.99 * n) AS BIGINT)) THEN v END) AS hi FROM s) "
            "SELECT (SELECT count(*) FROM events) AS n, lo, hi, "
            "round(CAST(sum(CAST(round(greatest(lo, least(hi, value)) "
            "  * 100) AS BIGINT)) AS DOUBLE) / 100 "
            "  / (SELECT count(*) FROM events), 6) AS winsorized_mean "
            "FROM events, qb GROUP BY lo, hi"
        ),
        "segment_users_abc": (
            "WITH p AS (SELECT user_id, "
            "  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "    AS a, "
            "  max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS b, "
            "  max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c "
            "  FROM events GROUP BY 1) "
            "SELECT CAST(sum(a) AS BIGINT) AS n_purchase, "
            "CAST(sum(b) AS BIGINT) AS n_click, "
            "CAST(sum(c) AS BIGINT) AS n_error, "
            "CAST(sum(CASE WHEN a = 1 AND b = 1 AND c = 0 THEN 1 ELSE 0 "
            "  END) AS BIGINT) AS n_target FROM p"
        ),
        "source_lm_divergence": (
            "WITH toks AS (SELECT source, "
            "  regexp_extract_all(lower(text), '[a-z0-9]+') AS ws "
            "  FROM documents), "
            "pairs AS (SELECT source, unnest([{'a': ws[i], 'b': ws[i+1]} "
            "  for i in generate_series(1, greatest(len(ws) - 1, 0))]) "
            "  AS x FROM toks), "
            "pc AS (SELECT source, x.a AS a, x.b AS b, count(*) AS n "
            "  FROM pairs GROUP BY 1, 2, 3), "
            "cu AS (SELECT source, a, sum(n) AS na FROM pc GROUP BY 1, 2), "
            "vv AS (SELECT count(DISTINCT token) AS v FROM (SELECT "
            "  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "  AS token FROM documents)), "
            "nb AS (SELECT source, sum(n) AS nb FROM pc GROUP BY 1), "
            "srcs AS (SELECT DISTINCT source FROM documents), "
            "x AS (SELECT s.source AS lm_source, "
            "  b.source AS target_source, "
            "  sum(b.n * log2((COALESCE(ca.n, 0) + 1.0) "
            "    / (COALESCE(cua.na, 0) + v))) AS t "
            "  FROM pc b CROSS JOIN srcs s CROSS JOIN vv "
            "  LEFT JOIN pc ca ON ca.source = s.source AND ca.a = b.a "
            "    AND ca.b = b.b "
            "  LEFT JOIN cu cua ON cua.source = s.source AND cua.a = b.a "
            "  GROUP BY 1, 2) "
            "SELECT lm_source, target_source, "
            "CAST(nb AS BIGINT) AS n_bigrams, "
            "round(-t / CAST(nb AS DOUBLE), 6) AS cross_entropy_bits "
            "FROM x JOIN nb ON nb.source = x.target_source"
        ),
        "train_val_test_split": (
            "WITH s AS (SELECT source, CASE "
            "  WHEN substring(md5(text), 1, 8) < lpad(lower(to_hex("
            "    CAST(least(floor(0.8 * 4294967296.0), 4294967295.0) "
            "    AS BIGINT))), 8, '0') THEN 'train' "
            "  WHEN substring(md5(text), 1, 8) < lpad(lower(to_hex("
            "    CAST(least(floor(0.9 * 4294967296.0), 4294967295.0) "
            "    AS BIGINT))), 8, '0') THEN 'val' "
            "  ELSE 'test' END AS split FROM documents), "
            "c AS (SELECT source, split, count(*) AS n_docs "
            "  FROM s GROUP BY 1, 2), "
            "t AS (SELECT source, sum(n_docs) AS tot FROM c GROUP BY 1) "
            "SELECT c.source, split, n_docs, "
            "round(CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE), 6) "
            "  AS fraction FROM c JOIN t ON c.source = t.source"
        ),
        "benford_price": (
            "WITH f AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice) "
            "  AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit "
            "  FROM orders WHERE floor(o_totalprice) >= 1), "
            "c AS (SELECT digit, count(*) AS n FROM f GROUP BY 1), "
            "d9 AS (SELECT unnest(generate_series(1, 9)) AS digit), "
            "j AS (SELECT d9.digit, COALESCE(n, 0) AS n FROM d9 "
            "  LEFT JOIN c ON c.digit = d9.digit), "
            "t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM j), "
            "x AS (SELECT sum((CAST(n AS DOUBLE) "
            "  - log10(1 + 1.0 / digit) * total) "
            "  * (CAST(n AS DOUBLE) - log10(1 + 1.0 / digit) * total) "
            "  / (log10(1 + 1.0 / digit) * total)) AS chi2 FROM j, t) "
            "SELECT j.digit, n, "
            "round(CAST(n AS DOUBLE) / total, 6) AS observed_p, "
            "round(log10(1 + 1.0 / digit), 6) AS expected_p, "
            "round(chi2, 6) AS chi2 FROM j, t, x"
        ),
        "price_dispersion_by_type": (
            "WITH m AS (SELECT p_type, "
            "  CAST(round(p_retailprice * 100) AS BIGINT) AS x FROM part), "
            "a AS (SELECT p_type, count(*) AS n, sum(x) AS sx, "
            "  sum(x * x) AS sxx FROM m GROUP BY 1) "
            "SELECT p_type, CAST(n AS BIGINT) AS n, "
            "round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100, 6) "
            "  AS mean_price, "
            "round(sqrt((CAST(n * sxx - sx * sx AS DOUBLE) "
            "  / CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE)) / 10000), 6) "
            "  AS stddev_price FROM a WHERE n >= 2"
        ),
        "price_mad": (
            "WITH s AS (SELECT o_totalprice AS v, "
            "  row_number() OVER (ORDER BY o_totalprice) AS rn, "
            "  count(*) OVER () AS n FROM orders), "
            "m AS (SELECT v AS med FROM s WHERE rn = greatest(1, "
            "  CAST(ceil(0.5 * n) AS BIGINT))), "
            "d AS (SELECT abs(o_totalprice - med) AS dv FROM orders, m), "
            "s2 AS (SELECT dv, row_number() OVER (ORDER BY dv) AS rn, "
            "  count(*) OVER () AS n FROM d), "
            "m2 AS (SELECT dv AS mad FROM s2 WHERE rn = greatest(1, "
            "  CAST(ceil(0.5 * n) AS BIGINT))) "
            "SELECT round(med, 6) AS median, round(mad, 6) AS mad "
            "FROM m, m2"
        ),
        "charclass_profile": (
            "WITH m AS (SELECT source, length(text) AS n, "
            "  len(regexp_extract_all(text, '[A-Za-z]')) AS a, "
            "  len(regexp_extract_all(text, '[0-9]')) AS d, "
            "  len(regexp_extract_all(text, '\\s')) AS sp "
            "  FROM documents), "
            "a2 AS (SELECT source, sum(n) AS n, sum(a) AS a, sum(d) AS d, "
            "  sum(sp) AS sp FROM m GROUP BY 1) "
            "SELECT source, CAST(n AS BIGINT) AS n_chars, "
            "round(CAST(a AS DOUBLE) / greatest(CAST(n AS DOUBLE), 1.0), 6) "
            "  AS alpha_frac, "
            "round(CAST(d AS DOUBLE) / greatest(CAST(n AS DOUBLE), 1.0), 6) "
            "  AS digit_frac, "
            "round(CAST(sp AS DOUBLE) / greatest(CAST(n AS DOUBLE), 1.0), 6) "
            "  AS space_frac, "
            "round(CAST(n - a - d - sp AS DOUBLE) "
            "  / greatest(CAST(n AS DOUBLE), 1.0), 6) AS other_frac "
            "FROM a2"
        ),
        "hourly_profile": (
            "WITH c AS (SELECT event_type, "
            "  CAST(hour(ts) AS BIGINT) AS hour, count(*) AS n "
            "  FROM events GROUP BY 1, 2), "
            "t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1) "
            "SELECT c.event_type, hour, n, "
            "round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) "
            "  AS frac_of_type FROM c JOIN t ON c.event_type = t.event_type"
        ),
        "order_fulfillment_hist": (
            "WITH m AS (SELECT o_orderkey, "
            "  CAST(CAST(max(l_shipdate) AS DATE) "
            "    - CAST(o_orderdate AS DATE) AS BIGINT) AS days "
            "  FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "  GROUP BY o_orderkey, o_orderdate) "
            "SELECT days, count(*) AS n_orders FROM m GROUP BY 1"
        ),
        "weekend_value_ttest": (
            "WITH m AS (SELECT event_type, "
            "  CASE WHEN ((epoch_us(ts) // 86400000000 + 4) % 7) >= 5 "
            "    THEN 1 ELSE 0 END AS we, "
            "  CAST(round(value * 100) AS BIGINT) AS x FROM events), "
            "a AS (SELECT event_type, we, count(*) AS n, sum(x) AS sx, "
            "  sum(x * x) AS sxx FROM m GROUP BY 1, 2), "
            "p AS (SELECT w.event_type, w.n AS n1, w.sx AS s1, "
            "  w.sxx AS q1, e.n AS n2, e.sx AS s2, e.sxx AS q2 "
            "  FROM a w JOIN a e ON w.event_type = e.event_type "
            "  AND w.we = 0 AND e.we = 1) "
            "SELECT event_type, CAST(n1 AS BIGINT) AS n_weekday, "
            "CAST(n2 AS BIGINT) AS n_weekend, "
            "round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100, 6) "
            "  AS mean_wd, "
            "round(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100, 6) "
            "  AS mean_we, "
            "round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100 "
            "  - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100) "
            "  / sqrt(((CAST(n1 * q1 - s1 * s1 AS DOUBLE) "
            "    / CAST(n1 AS DOUBLE) / CAST(n1 - 1 AS DOUBLE)) / 10000) "
            "    / n1 "
            "  + ((CAST(n2 * q2 - s2 * s2 AS DOUBLE) "
            "    / CAST(n2 AS DOUBLE) / CAST(n2 - 1 AS DOUBLE)) / 10000) "
            "    / n2), 6) AS t_stat "
            "FROM p WHERE n1 >= 2 AND n2 >= 2"
        ),
        "source_dedup_rate": (
            "SELECT source, count(*) AS n_docs, "
            "count(*) - count(DISTINCT md5(text)) AS n_dup, "
            "round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) "
            "  / greatest(CAST(count(*) AS DOUBLE), 1.0), 6) AS dup_rate "
            "FROM documents GROUP BY source"
        ),
        # --- round-4 recursive-CTE oracles for the reachability-shaped
        # queries (previously pytest-only). The part-chain graph CTE
        # mirrors pipelines/graphalgos.chain_edge_ds (order_mod=16);
        # scc_id = min member id (transitive-closure mutual-reach form,
        # fine at sf0.01's 1.7k vertices / 3k edges).
        "scc_chain": _CHAIN_SCC_CTE + "SELECT id, scc_id FROM scc",
        "bowtie_chain": _CHAIN_SCC_CTE + (
            ", core AS (SELECT scc_id FROM (SELECT scc_id, count(*) AS c "
            "  FROM scc GROUP BY 1 ORDER BY c DESC, scc_id LIMIT 1)), "
            "coreids AS (SELECT id FROM scc "
            "  WHERE scc_id IN (SELECT scc_id FROM core)), "
            "outs AS (SELECT DISTINCT r.b AS id FROM reach r "
            "  JOIN coreids c ON r.a = c.id), "
            "ins AS (SELECT DISTINCT r.a AS id FROM reach r "
            "  JOIN coreids c ON r.b = c.id), "
            "cls AS (SELECT s.id, CASE "
            "  WHEN s.scc_id IN (SELECT scc_id FROM core) THEN 'CORE' "
            "  WHEN s.id IN (SELECT id FROM outs) THEN 'OUT' "
            "  WHEN s.id IN (SELECT id FROM ins) THEN 'IN' "
            "  ELSE 'OTHER' END AS component FROM scc s) "
            "SELECT component, count(*) AS n_vertices FROM cls GROUP BY 1"
        ),
        # Newman (out,in)-assortativity from exact integer moments; the
        # float expression tree mirrors the pipeline term-for-term
        # (reuses the chain CTE; DuckDB does not execute the unreferenced
        # reach/mut/scc CTEs)
        "chain_degree_assortativity": _CHAIN_SCC_CTE + (
            ", outd AS (SELECT src AS id, count(*) AS od FROM edges "
            "  GROUP BY 1), "
            "ind AS (SELECT dst AS id, count(*) AS idg FROM edges "
            "  GROUP BY 1), "
            "j AS (SELECT o.od AS x, i.idg AS y FROM edges e "
            "  JOIN outd o ON o.id = e.src JOIN ind i ON i.id = e.dst), "
            "mm AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
            "  sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy "
            "  FROM j) "
            "SELECT CAST(n AS BIGINT) AS n_edges, "
            "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
            "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
            "  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
            "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
            "    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
            "    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) "
            "  AS r_out_in FROM mm"
        ),
        # longest backward-citation chain over the deterministic works
        # fixture the pipeline itself (re)generates under tempdir; the
        # (id, d) chain-length pairs are bounded by V x max_depth, so the
        # UNION-dedup fixpoint stays small even at ~290 levels deep
        "citation_depth": _citation_depth_oracle(),
        # fixed-iteration linear programs (VERDICT r4 #3): the SAME
        # iteration the engine runs, expressed as bounded recursive CTEs
        # with identical float operation order — the flagship PageRank
        # kernel enters the driver's hash-checked set
        "pagerank_bipartite": _pagerank_bipartite_oracle(),
        "katz_bipartite": _katz_bipartite_oracle(),
        "sssp_chain": _sssp_chain_oracle(),
        "weighted_pagerank": _weighted_pagerank_oracle(),
        "ppr_bipartite": _ppr_bipartite_oracle(),
        "hits_bipartite": _hits_bipartite_oracle(),
        "walk_entropy_rate": _walk_entropy_rate_oracle(),
        "eigenvector_cooccur": _eigenvector_cooccur_oracle(),
        "hitting_time_cooccur": _hitting_time_cooccur_oracle(),
        "diameter_2sweep": _diameter_2sweep_oracle(),
        "betweenness_chain": _betweenness_chain_oracle(),
        "sssp_path_chain": _sssp_path_chain_oracle(),
    }


_CHAIN_SCC_CTE = (
    "WITH RECURSIVE li AS (SELECT l_orderkey, l_linenumber, l_partkey "
    "  FROM lineitem WHERE l_orderkey % 16 = 0), "
    "e0 AS (SELECT l_partkey AS src, lead(l_partkey) OVER ("
    "  PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst "
    "  FROM li), "
    "edges AS (SELECT DISTINCT src, dst FROM e0 "
    "  WHERE dst IS NOT NULL AND src <> dst), "
    "verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges), "
    "reach AS (SELECT src AS a, dst AS b FROM edges "
    "  UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b), "
    "mut AS (SELECT r1.a AS u, r1.b AS v FROM reach r1 "
    "  JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a), "
    "scc AS (SELECT v.id, CAST(least(v.id, coalesce(min(m.v), v.id)) "
    "  AS BIGINT) AS scc_id "
    "  FROM verts v LEFT JOIN mut m ON m.u = v.id GROUP BY v.id) "
)


def _citation_depth_oracle() -> str:
    """Built at call time so the fixture path matches the pipeline's
    ``tempfile.gettempdir()`` exactly (citations.citation_depth writes
    /tmp/graft_works_citedepth and the driver runs the pipeline before
    the oracle, so the parquet exists by comparison time)."""
    import os
    import tempfile

    p = os.path.join(tempfile.gettempdir(), "graft_works_citedepth",
                     "works.parquet")
    return (
        "WITH RECURSIVE w AS (SELECT id, referenced_works "
        f"  FROM read_parquet('{p}')), "
        "e AS (SELECT unnest(referenced_works) AS src, id AS dst FROM w), "
        "eb AS (SELECT DISTINCT src, dst FROM e WHERE src < dst), "
        "verts AS (SELECT src AS id FROM eb UNION SELECT dst FROM eb), "
        "ch AS (SELECT id, 0 AS d FROM verts "
        "  UNION SELECT e2.dst, c.d + 1 FROM ch c "
        "  JOIN eb e2 ON e2.src = c.id) "
        "SELECT id, max(d) AS depth FROM ch GROUP BY id"
    )


def _pagerank_bipartite_oracle(iters: int = 25) -> str:
    """Fixed-iteration PageRank power method as a bounded recursive CTE —
    exactly engine/pagerank.py's formulation r_{k+1}(v) = (1-d)/N +
    d*(sum_{u->v} r_k(u)/outdeg(u) + D_k/N) over the order->part
    multigraph, r_0 = 1/N, 25 rounds (pagerank_bipartite runs tol=0 /
    max_iters=25, so both sides compute the identical truncation; residual
    float differences are summation-order only, ~1e-16).

    Two CTE steps per engine round: phase A (even iter) computes the raw
    in-contribution sums and routes the dangling mass to a collector
    vertex -2; phase B applies the affine update, with the collector
    spreading D_k/N back to every vertex. Self-loops (w=0 in phase A,
    w=1 in phase B) keep zero-in-degree vertices present. DuckDB 1.0
    quirk: non-recursive CTEs inside WITH RECURSIVE do not dedup UNION,
    hence the explicit DISTINCT on verts."""
    return _pagerank_core_cte(iters) + (
        "SELECT id, round(val, 9) AS rank FROM bf "
        f"WHERE iter = {2 * iters} AND id <> -2"
    )


def _pagerank_core_cte(iters: int) -> str:
    """The shared WITH body of the fixed-iteration PageRank recursion
    (consumed by _pagerank_bipartite_oracle and
    _walk_entropy_rate_oracle, which append different final selects)."""
    return (
        "WITH RECURSIVE "
        "e AS (SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem), "
        "verts AS (SELECT DISTINCT id FROM ("
        "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts), "
        "outd AS (SELECT v.id, count(e.src) AS o FROM verts v "
        "  LEFT JOIN e ON e.src = v.id GROUP BY v.id), "
        "ea AS ("
        "  SELECT e.src, e.dst, 1.0 / greatest(o.o, 1) AS w, 0 AS ph "
        "    FROM e JOIN outd o ON o.id = e.src "
        "  UNION ALL SELECT id, -2, 1.0, 0 FROM outd WHERE o = 0 "
        "  UNION ALL SELECT id, id, 0.0, 0 FROM verts "
        "  UNION ALL SELECT id, id, 1.0, 1 FROM verts "
        "  UNION ALL SELECT -2, id, 1.0 / (SELECT n FROM nv), 1 FROM verts"
        "), "
        "bf AS ("
        "  SELECT 0 AS iter, id, 1.0 / (SELECT n FROM nv) AS val FROM verts "
        "  UNION ALL "
        "  SELECT b.iter + 1, g.dst, "
        "    CASE WHEN b.iter % 2 = 0 THEN sum(b.val * g.w) "
        "         ELSE (1.0 - 0.85) / (SELECT n FROM nv) "
        "              + 0.85 * sum(b.val * g.w) END "
        "  FROM bf b JOIN ea g ON g.src = b.id AND g.ph = b.iter % 2 "
        f"  WHERE b.iter < {2 * iters} GROUP BY b.iter, g.dst) "
    )


def _walk_entropy_rate_oracle(iters: int = 25) -> str:
    """Entropy rate of the PageRank-stationary walk
    (graphalgos.walk_entropy_rate: H = sum_v pi_v*log2(outdeg_v) for
    walk vertices + (dangling share)*log2(max(N,2)) bits/step) — the
    fixed-25-iteration PageRank core plus one fold; walk_entropy_rate
    runs the same pagerank25 state as pagerank_bipartite."""
    return _pagerank_core_cte(iters) + (
        f", pr AS (SELECT id, val FROM bf "
        f"    WHERE iter = {2 * iters} AND id <> -2) "
        "SELECT round(sum(CASE WHEN o.o > 0 "
        "    THEN p.val * log2(CAST(o.o AS DOUBLE)) ELSE 0.0 END) "
        "  + sum(CASE WHEN o.o = 0 THEN p.val ELSE 0.0 END) "
        "    * log2(greatest((SELECT n FROM nv), 2.0)), 6) "
        "  AS entropy_rate_bits, "
        "round(sum(CASE WHEN o.o = 0 THEN p.val ELSE 0.0 END), 6) "
        "  AS dangling_share "
        "FROM pr p JOIN outd o ON o.id = p.id"
    )


def _katz_bipartite_oracle(iters: int = 5) -> str:
    """Fixed-iteration Katz centrality (engine/katz.py Jacobi x_{k+1} =
    alpha * A^T x_k + 1, x_0 = 1, alpha = 0.85/max_out_degree) over the
    order->part multigraph as a bounded recursive CTE; katz_bipartite runs
    tol=0 / max_iters=5 (the exact fixpoint: A^T is nilpotent on the
    one-directional order->part edge set) so both sides compute the
    identical truncation.
    Self-loops with w=0 keep zero-in-degree vertices present."""
    return (
        "WITH RECURSIVE "
        "e AS (SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem), "
        "verts AS (SELECT DISTINCT id FROM ("
        "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
        "al AS (SELECT 0.85 / greatest(max(c), 1) AS a FROM ("
        "  SELECT count(*) AS c FROM e GROUP BY src)), "
        "ea AS (SELECT src, dst, 1.0 AS w FROM e "
        "  UNION ALL SELECT id, id, 0.0 FROM verts), "
        "bf AS ("
        # CAST pins the recursion's column type: a recursive CTE's types
        # come from the initial term, and a bare 1.0 is DECIMAL(2,1) in
        # DuckDB — the whole iteration would silently round to 1 decimal
        "  SELECT 0 AS iter, id, CAST(1.0 AS DOUBLE) AS val FROM verts "
        "  UNION ALL "
        "  SELECT b.iter + 1, g.dst, "
        "    (SELECT a FROM al) * sum(b.val * g.w) + 1.0 "
        "  FROM bf b JOIN ea g ON g.src = b.id "
        f"  WHERE b.iter < {iters} GROUP BY b.iter, g.dst) "
        f"SELECT id, round(val, 9) AS katz FROM bf WHERE iter = {iters}"
    )


def _sssp_chain_oracle(rounds: int = 256) -> str:
    """Weighted SSSP over the part-chain graph as a bounded Bellman-Ford
    recursive CTE: d_{k+1}(v) = min(d_k(v), min_{u->v} d_k(u) + w) via a
    w=0 self-loop per vertex, seeded at min(src), w = (src+dst)%9+1
    (sssp_chain's documented synthetic weight). 256 rounds = the engine's
    max_iters cap, so the states agree even if the cap truncates; weights
    are integers, so distances are float64-exact regardless of evaluation
    order. Unreached stays +inf through the recursion and maps to -1."""
    return (
        "WITH RECURSIVE li AS (SELECT l_orderkey, l_linenumber, l_partkey "
        "  FROM lineitem WHERE l_orderkey % 16 = 0), "
        "e0 AS (SELECT l_partkey AS src, lead(l_partkey) OVER ("
        "  PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst "
        "  FROM li), "
        "e AS (SELECT DISTINCT src, dst FROM e0 "
        "  WHERE dst IS NOT NULL AND src <> dst), "
        "verts AS (SELECT DISTINCT id FROM ("
        "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
        "sd AS (SELECT min(src) AS s FROM e), "
        "ew AS (SELECT src, dst, CAST((src + dst) % 9 + 1 AS DOUBLE) AS w "
        "  FROM e UNION ALL SELECT id, id, 0.0 FROM verts), "
        "bf AS ("
        "  SELECT 0 AS iter, v.id, CASE WHEN v.id = (SELECT s FROM sd) "
        "    THEN 0.0 ELSE CAST('infinity' AS DOUBLE) END AS dist "
        "  FROM verts v "
        "  UNION ALL "
        "  SELECT b.iter + 1, g.dst, min(b.dist + g.w) "
        "  FROM bf b JOIN ew g ON g.src = b.id "
        f"  WHERE b.iter < {rounds} GROUP BY b.iter, g.dst) "
        "SELECT id, CASE WHEN isinf(dist) THEN -1.0 ELSE dist END AS dist "
        f"FROM bf WHERE iter = {rounds}"
    )


def _weighted_pagerank_oracle(iters: int = 25) -> str:
    """Fixed-iteration weighted PageRank (engine/wpagerank.py: r_{k+1}(v)
    = (1-d)/N + d*(sum_{u->v} (w/W(u))*r_k(u) + D_k/N), w = l_quantity,
    W(u) = u's out-weight sum, dangling = no out-edges) as a bounded
    recursive CTE — the same two-phase collector scheme as
    _pagerank_bipartite_oracle; weighted_pagerank_bipartite runs tol=0 /
    max_iters=25 so both sides compute the identical truncation."""
    return (
        "WITH RECURSIVE "
        "e AS (SELECT l_orderkey AS src, l_partkey AS dst, "
        "  CAST(l_quantity AS DOUBLE) AS w FROM lineitem), "
        "verts AS (SELECT DISTINCT id FROM ("
        "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts), "
        "ws AS (SELECT src, sum(w) AS wsum FROM e GROUP BY src), "
        "ea AS ("
        "  SELECT e.src, e.dst, e.w / ws.wsum AS w, 0 AS ph "
        "    FROM e JOIN ws ON ws.src = e.src "
        "  UNION ALL SELECT v.id, -2, 1.0, 0 FROM verts v "
        "    WHERE v.id NOT IN (SELECT src FROM ws) "
        "  UNION ALL SELECT id, id, 0.0, 0 FROM verts "
        "  UNION ALL SELECT id, id, 1.0, 1 FROM verts "
        "  UNION ALL SELECT -2, id, 1.0 / (SELECT n FROM nv), 1 FROM verts"
        "), "
        "bf AS ("
        "  SELECT 0 AS iter, id, 1.0 / (SELECT n FROM nv) AS val FROM verts "
        "  UNION ALL "
        "  SELECT b.iter + 1, g.dst, "
        "    CASE WHEN b.iter % 2 = 0 THEN sum(b.val * g.w) "
        "         ELSE (1.0 - 0.85) / (SELECT n FROM nv) "
        "              + 0.85 * sum(b.val * g.w) END "
        "  FROM bf b JOIN ea g ON g.src = b.id AND g.ph = b.iter % 2 "
        f"  WHERE b.iter < {2 * iters} GROUP BY b.iter, g.dst) "
        "SELECT id, round(val, 9) AS rank FROM bf "
        f"WHERE iter = {2 * iters} AND id <> -2"
    )


def _ppr_bipartite_oracle(iters: int = 25) -> str:
    """Fixed-iteration personalized PageRank (engine/ppr.py: r_{k+1}(v) =
    (1-d)*p(v) + d*(sum_{u->v} r_k(u)/outdeg(u) + D_k*p(v)), p = 1/|S| on
    the 5 smallest part vertices, r_0 = p) as a bounded recursive CTE.
    Teleport and dangling mass restart at the SEEDS only, so the phase-B
    collector spread edges target just the seed set; ppr_bipartite runs
    tol=0 / max_iters=25 so both sides compute the identical truncation."""
    return (
        "WITH RECURSIVE "
        "e AS (SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem), "
        "verts AS (SELECT DISTINCT id FROM ("
        "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
        "outd AS (SELECT v.id, count(e.src) AS o FROM verts v "
        "  LEFT JOIN e ON e.src = v.id GROUP BY v.id), "
        "sd AS (SELECT DISTINCT dst AS s FROM e ORDER BY dst LIMIT 5), "
        "ns AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM sd), "
        "ea AS ("
        "  SELECT e.src, e.dst, 1.0 / greatest(o.o, 1) AS w, 0 AS ph "
        "    FROM e JOIN outd o ON o.id = e.src "
        "  UNION ALL SELECT id, -2, 1.0, 0 FROM outd WHERE o = 0 "
        "  UNION ALL SELECT id, id, 0.0, 0 FROM verts "
        "  UNION ALL SELECT id, id, 1.0, 1 FROM verts "
        "  UNION ALL SELECT -2, s, 1.0 / (SELECT k FROM ns), 1 FROM sd"
        "), "
        "bf AS ("
        "  SELECT 0 AS iter, id, "
        "    CASE WHEN id IN (SELECT s FROM sd) "
        "      THEN 1.0 / (SELECT k FROM ns) "
        "      ELSE CAST(0.0 AS DOUBLE) END AS val FROM verts "
        "  UNION ALL "
        "  SELECT b.iter + 1, g.dst, "
        "    CASE WHEN b.iter % 2 = 0 THEN sum(b.val * g.w) "
        "         WHEN g.dst IN (SELECT s FROM sd) "
        "           THEN (1.0 - 0.85) * (1.0 / (SELECT k FROM ns)) "
        "                + 0.85 * sum(b.val * g.w) "
        "         ELSE 0.85 * sum(b.val * g.w) END "
        "  FROM bf b JOIN ea g ON g.src = b.id AND g.ph = b.iter % 2 "
        f"  WHERE b.iter < {2 * iters} GROUP BY b.iter, g.dst) "
        "SELECT id, round(val, 9) AS rank FROM bf "
        f"WHERE iter = {2 * iters} AND id <> -2"
    )


def _hits_bipartite_oracle(iters: int = 40) -> str:
    """Fixed-iteration HITS (engine/hits.py simultaneous update:
    a_{k+1}(v) = sum_{u->v} h_k(u)/||h_k||, h_{k+1}(u) = sum_{u->v}
    a_k(v)/||a_k||, h_0 = a_0 = 1/sqrt(N), final vectors L2-normalized)
    over the order->part multigraph as a bounded recursive CTE.
    hits_bipartite runs tol=-1 / max_iters=40 so both sides compute the
    identical truncation.

    Two CTE steps per engine round: phase A passes the raw state through
    identity edges and routes the squared sums to collector -2; phase B
    applies both half-updates at once, reading the norms from the
    collector-spread rows (kind 3). The final window normalizes like the
    engine's manifest-recorded-norm pass."""
    return (
        "WITH RECURSIVE "
        "e AS (SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem), "
        "verts AS (SELECT DISTINCT id FROM ("
        "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts), "
        "ea AS ("
        "  SELECT id AS src, id AS dst, 0 AS kind, 0 AS ph FROM verts "
        "  UNION ALL SELECT id, -2, 1, 0 FROM verts "
        "  UNION ALL SELECT src, dst, 1, 1 FROM e "
        "  UNION ALL SELECT dst, src, 2, 1 FROM e "
        "  UNION ALL SELECT -2, id, 3, 1 FROM verts"
        "), "
        "bf AS ("
        "  SELECT 0 AS iter, id, 1.0 / sqrt((SELECT n FROM nv)) AS hub, "
        "         1.0 / sqrt((SELECT n FROM nv)) AS auth FROM verts "
        "  UNION ALL "
        "  SELECT b.iter + 1, g.dst, "
        "    CASE WHEN b.iter % 2 = 0 THEN "
        "           CASE WHEN g.dst = -2 THEN sum(b.hub * b.hub) "
        "                ELSE sum(b.hub) END "
        "         ELSE coalesce(sum(b.auth) FILTER (g.kind = 2), 0.0) "
        "              / sqrt(greatest(max(CASE WHEN g.kind = 3 "
        "                THEN b.auth END), 1e-300)) END, "
        "    CASE WHEN b.iter % 2 = 0 THEN "
        "           CASE WHEN g.dst = -2 THEN sum(b.auth * b.auth) "
        "                ELSE sum(b.auth) END "
        "         ELSE coalesce(sum(b.hub) FILTER (g.kind = 1), 0.0) "
        "              / sqrt(greatest(max(CASE WHEN g.kind = 3 "
        "                THEN b.hub END), 1e-300)) END "
        "  FROM bf b JOIN ea g ON g.src = b.id AND g.ph = b.iter % 2 "
        f"  WHERE b.iter < {2 * iters} GROUP BY b.iter, g.dst) "
        "SELECT id, "
        "  round(hub / sqrt(greatest(sum(hub * hub) OVER (), 1e-300)), 9) "
        "    AS hub, "
        "  round(auth / sqrt(greatest(sum(auth * auth) OVER (), 1e-300)), 9) "
        "    AS auth "
        f"FROM bf WHERE iter = {2 * iters} AND id <> -2"
    )


def _eigenvector_cooccur_oracle(iters: int = 40) -> str:
    """Fixed-iteration eigenvector centrality of the undirected part
    co-occurrence graph (graphalgos.eigenvector_cooccur: HITS over a
    symmetric edge set, where hub == auth == the principal eigenvector,
    so a SINGLE-vector power iteration x' = A x / ||x|| suffices) as a
    bounded recursive CTE with the HITS collector scheme.
    eigenvector_cooccur runs tol=-1 / max_iters=40 so both sides compute
    the identical truncation; output (id, score) L2-normalized."""
    return (
        "WITH RECURSIVE "
        "po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "und AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
        "  FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey "
        "  AND a.l_partkey < b.l_partkey), "
        "e AS (SELECT u AS src, v AS dst FROM und "
        "  UNION ALL SELECT v, u FROM und), "
        "verts AS (SELECT DISTINCT id FROM ("
        "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts), "
        "ea AS ("
        "  SELECT id AS src, id AS dst, 0 AS kind, 0 AS ph FROM verts "
        "  UNION ALL SELECT id, -2, 1, 0 FROM verts "
        "  UNION ALL SELECT src, dst, 1, 1 FROM e "
        "  UNION ALL SELECT -2, id, 3, 1 FROM verts"
        "), "
        "bf AS ("
        "  SELECT 0 AS iter, id, 1.0 / sqrt((SELECT n FROM nv)) AS x "
        "  FROM verts "
        "  UNION ALL "
        "  SELECT b.iter + 1, g.dst, "
        "    CASE WHEN b.iter % 2 = 0 THEN "
        "           CASE WHEN g.dst = -2 THEN sum(b.x * b.x) "
        "                ELSE sum(b.x) END "
        "         ELSE coalesce(sum(b.x) FILTER (g.kind = 1), 0.0) "
        "              / sqrt(greatest(max(CASE WHEN g.kind = 3 "
        "                THEN b.x END), 1e-300)) END "
        "  FROM bf b JOIN ea g ON g.src = b.id AND g.ph = b.iter % 2 "
        f"  WHERE b.iter < {2 * iters} GROUP BY b.iter, g.dst) "
        "SELECT id, "
        "  round(x / sqrt(greatest(sum(x * x) OVER (), 1e-300)), 9) "
        "    AS score "
        f"FROM bf WHERE iter = {2 * iters} AND id <> -2"
    )


_COOCCUR_SYM_CTE = (
    "po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "und AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
    "  FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey "
    "  AND a.l_partkey < b.l_partkey), "
    "e AS (SELECT u AS src, v AS dst FROM und "
    "  UNION ALL SELECT v, u FROM und), "
    "verts AS (SELECT DISTINCT id FROM ("
    "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
)


def _hitting_time_cooccur_oracle(rounds: int = 80) -> str:
    """Fixed-round Jacobi hitting times to {id % 8 == 0} on the
    symmetrized part co-occurrence graph (engine/hitting.py: h(v) = 0 on
    targets, else 1 + mean over neighbors; 80 rounds; -1.0 sentinel when
    the final Jacobi delta exceeds 1e-3) as a bounded recursive CTE.
    Already fixed-round in the engine, so no query change was needed; the
    final delta is |h_80 - h_79|, read by self-joining the recursion's
    last two iterations. Empirical threshold margin at the 1e-3 cut is
    ~1e-3 (vs float drift ~1e-13), so the sentinel set is stable."""
    return (
        "WITH RECURSIVE " + _COOCCUR_SYM_CTE +
        "dg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS deg "
        "  FROM e GROUP BY src), "
        "ea AS (SELECT e.src, e.dst, 1.0 AS w, d.deg AS dst_deg FROM e "
        "  JOIN dg d ON d.id = e.dst "
        "  UNION ALL SELECT v.id, v.id, 0.0, coalesce(d.deg, 0.0) "
        "  FROM verts v LEFT JOIN dg d ON d.id = v.id), "
        "bf AS ("
        # CAST pins the recursion's value type (bare 0.0 is DECIMAL(2,1)
        # in DuckDB and would silently round every iteration)
        "  SELECT 0 AS iter, id, CAST(0.0 AS DOUBLE) AS h FROM verts "
        "  UNION ALL "
        "  SELECT b.iter + 1, g.dst, "
        "    CASE WHEN g.dst % 8 = 0 OR max(g.dst_deg) = 0 THEN 0.0 "
        "         ELSE 1.0 + sum(b.h * g.w) "
        "              / greatest(max(g.dst_deg), 1.0) END "
        f"  FROM bf b JOIN ea g ON g.src = b.id WHERE b.iter < {rounds} "
        "  GROUP BY b.iter, g.dst) "
        "SELECT a.id, CASE WHEN a.id % 8 = 0 OR abs(a.h - p.h) <= 1e-3 "
        "  THEN a.h ELSE -1.0 END AS hitting_time "
        f"FROM bf a JOIN bf p ON p.id = a.id AND p.iter = {rounds - 1} "
        f"WHERE a.iter = {rounds}"
    )


def _diameter_2sweep_oracle(cap: int = 64) -> str:
    """Double-sweep diameter lower bound of the undirected co-occurrence
    graph (graphalgos.diameter_2sweep: BFS from min vertex id, farthest
    vertex with ties to min id, BFS again, report the second
    eccentricity) — two UNION-dedup min-hop recursions capped at the
    engine's 64-hop BFS budget; all-integer output, exact."""
    return (
        "WITH RECURSIVE " + _COOCCUR_SYM_CTE +
        "s1 AS (SELECT min(src) AS s FROM e), "
        "r1 AS (SELECT (SELECT s FROM s1) AS id, 0 AS d "
        "  UNION SELECT e2.dst, r.d + 1 FROM r1 r "
        f"  JOIN e e2 ON e2.src = r.id WHERE r.d < {cap}), "
        "d1 AS (SELECT id, min(d) AS d FROM r1 GROUP BY id), "
        "s2 AS (SELECT id FROM d1 ORDER BY d DESC, id LIMIT 1), "
        "r2 AS (SELECT (SELECT id FROM s2) AS id, 0 AS d "
        "  UNION SELECT e2.dst, r.d + 1 FROM r2 r "
        f"  JOIN e e2 ON e2.src = r.id WHERE r.d < {cap}), "
        "d2 AS (SELECT id, min(d) AS d FROM r2 GROUP BY id) "
        "SELECT (SELECT s FROM s1) AS seed1, (SELECT id FROM s2) AS seed2, "
        "  (SELECT max(d) FROM d2) AS lb_diameter"
    )


def _betweenness_chain_oracle(cap: int = 200) -> str:
    """Sampled-source Brandes betweenness over the directed part-chain
    graph (graphalgos.betweenness_chain / engine/betweenness.py: forward
    level-synchronous BFS with path counting, backward dependency
    accumulation by descending layer, raw pair-dependency sum over the 4
    smallest source ids, sources' own rows excluded) as three chained
    recursions:

    - ``r``/``dist``: UNION-dedup min-hop distances per source;
    - ``sg``: sigma by level — every row sits at its vertex's true BFS
      level, so one grouped step per level sums exactly the shortest-path
      predecessors (Brandes' forward invariant);
    - ``bw``: the engine's global descending layer walk — all (source,
      vertex) rows ride every round (kind-0 self rows carry dlt), and a
      vertex at layer t-1 absorbs sigma_v * sum((1+dlt_w)/sigma_w) from
      kind-1 reversed-edge rows whose sender sits at layer t.

    MATERIALIZED on dist/sg/dmax is required: DuckDB 1.0 inlines plain
    CTEs into every recursion round, re-running the upstream recursive
    scans per round (measured: >400 s vs ~1 s at sf0.001)."""
    return (
        "WITH RECURSIVE "
        "li AS (SELECT l_orderkey, l_linenumber, l_partkey "
        "  FROM lineitem WHERE l_orderkey % 16 = 0), "
        "e0 AS (SELECT l_partkey AS src, lead(l_partkey) OVER ("
        "  PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst "
        "  FROM li), "
        "e AS (SELECT DISTINCT src, dst FROM e0 "
        "  WHERE dst IS NOT NULL AND src <> dst), "
        "verts AS (SELECT DISTINCT id FROM ("
        "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
        "sd AS (SELECT src AS s FROM ("
        "  SELECT DISTINCT src FROM e ORDER BY src LIMIT 4)), "
        "r AS (SELECT s, s AS id, 0 AS d FROM sd "
        "  UNION SELECT r.s, e2.dst, r.d + 1 FROM r "
        f"  JOIN e e2 ON e2.src = r.id WHERE r.d < {cap}), "
        "dist AS MATERIALIZED ("
        "  SELECT s, id, min(d) AS d FROM r GROUP BY s, id), "
        "sg AS (SELECT s, s AS id, 0 AS d, CAST(1.0 AS DOUBLE) AS sig "
        "  FROM sd "
        "  UNION ALL "
        "  SELECT g.s, e2.dst, g.d + 1, sum(g.sig) "
        "  FROM sg g JOIN e e2 ON e2.src = g.id "
        "  JOIN dist dd ON dd.s = g.s AND dd.id = e2.dst "
        "    AND dd.d = g.d + 1 "
        f"  WHERE g.d < {cap} GROUP BY g.s, e2.dst, g.d + 1), "
        "sgm AS MATERIALIZED (SELECT s, id, sig FROM sg), "
        "dmax AS MATERIALIZED (SELECT max(d) AS m FROM dist), "
        "ea2 AS (SELECT id AS src, id AS dst, 0 AS kind FROM verts "
        "  UNION ALL SELECT dst, src, 1 FROM e), "
        "bw AS ("
        "  SELECT (SELECT m FROM dmax) + 1 AS t, s, id, "
        "    CAST(0.0 AS DOUBLE) AS dlt FROM dist "
        "  UNION ALL "
        "  SELECT b.t - 1, b.s, g.dst, "
        "    sum(CASE WHEN g.kind = 0 THEN b.dlt ELSE 0.0 END) "
        "    + CASE WHEN dv.d = b.t - 2 THEN sv.sig * sum("
        "        CASE WHEN g.kind = 1 AND dw.d = b.t - 1 "
        "          THEN (1.0 + b.dlt) / sw.sig ELSE 0.0 END) "
        "      ELSE 0.0 END "
        "  FROM bw b "
        "  JOIN ea2 g ON g.src = b.id "
        "  JOIN dist dv ON dv.s = b.s AND dv.id = g.dst "
        "  JOIN sgm sv ON sv.s = b.s AND sv.id = g.dst "
        "  JOIN dist dw ON dw.s = b.s AND dw.id = b.id "
        "  JOIN sgm sw ON sw.s = b.s AND sw.id = b.id "
        "  WHERE b.t > 1 "
        "  GROUP BY b.t, b.s, g.dst, dv.d, sv.sig) "
        "SELECT v.id, round(coalesce(sum(CASE WHEN b.id <> b.s "
        "  THEN b.dlt ELSE 0.0 END), 0.0), 9) AS bc "
        "FROM verts v LEFT JOIN bw b ON b.id = v.id AND b.t = 1 "
        "GROUP BY v.id"
    )


def _sssp_path_chain_oracle(rounds: int = 256) -> str:
    """Shortest-path EXTRACTION (graphalgos.sssp_path_chain /
    engine/sssp.SsspPathProgram): frontier Bellman-Ford carrying parent
    pointers with the engine's deterministic rule — per round, offers
    come only from vertices that IMPROVED last round, the round's winner
    per vertex is the (dist, parent)-lexicographic minimum, and only
    strictly-better distances update (ties keep the incumbent, so the
    recorded parent depends on arrival round exactly as in the engine) —
    then the farthest-vertex (max dist, min id) path walked seed→target.

    The lexicographic min rides one BIGINT pack dist*2^32 + parent
    (distances are integer-valued — weights are (src+dst)%9+1 — and
    parent ids < 2^32, so the pack is exact); kind-0 self rows carry the
    incumbent. 256 rounds = the engine cap. Output (step, id, dist)."""
    big = 4294967296
    cand = ("min(CASE WHEN g.kind = 1 AND b.imp = 1 "
            f"THEN CAST(b.dist + g.w AS BIGINT) * {big} + b.id END)")
    old_d = "max(CASE WHEN g.kind = 0 THEN b.dist END)"
    old_p = "max(CASE WHEN g.kind = 0 THEN b.parent END)"
    upd = (f"{cand} IS NOT NULL AND "
           f"CAST({cand} // {big} AS DOUBLE) < {old_d}")
    return (
        "WITH RECURSIVE "
        "li AS (SELECT l_orderkey, l_linenumber, l_partkey "
        "  FROM lineitem WHERE l_orderkey % 16 = 0), "
        "e0 AS (SELECT l_partkey AS src, lead(l_partkey) OVER ("
        "  PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst "
        "  FROM li), "
        "e AS (SELECT DISTINCT src, dst FROM e0 "
        "  WHERE dst IS NOT NULL AND src <> dst), "
        "verts AS (SELECT DISTINCT id FROM ("
        "  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)), "
        "sd0 AS (SELECT min(src) AS s FROM e), "
        "ew AS (SELECT src, dst, CAST((src + dst) % 9 + 1 AS DOUBLE) AS w "
        "  FROM e), "
        "ea AS (SELECT v.id AS src, v.id AS dst, CAST(0.0 AS DOUBLE) AS w, "
        "  0 AS kind FROM verts v "
        "  UNION ALL SELECT src, dst, w, 1 FROM ew), "
        "bf AS ("
        "  SELECT 0 AS iter, v.id, "
        "    CASE WHEN v.id = (SELECT s FROM sd0) THEN CAST(0.0 AS DOUBLE) "
        "      ELSE CAST('infinity' AS DOUBLE) END AS dist, "
        "    CASE WHEN v.id = (SELECT s FROM sd0) THEN v.id ELSE -1 END "
        "      AS parent, "
        "    CASE WHEN v.id = (SELECT s FROM sd0) THEN 1 ELSE 0 END AS imp "
        "  FROM verts v "
        "  UNION ALL "
        "  SELECT b.iter + 1, g.dst, "
        f"    CASE WHEN {upd} THEN CAST({cand} // {big} AS DOUBLE) "
        f"      ELSE {old_d} END, "
        f"    CASE WHEN {upd} THEN {cand} % {big} ELSE {old_p} END, "
        f"    CASE WHEN {upd} THEN 1 ELSE 0 END "
        f"  FROM bf b JOIN ea g ON g.src = b.id WHERE b.iter < {rounds} "
        "  GROUP BY b.iter, g.dst), "
        "fs AS MATERIALIZED ("
        f"  SELECT id, dist, parent FROM bf WHERE iter = {rounds}), "
        "tgt AS (SELECT id FROM fs WHERE NOT isinf(dist) "
        "  ORDER BY dist DESC, id LIMIT 1), "
        "walk AS (SELECT 0 AS k, (SELECT id FROM tgt) AS id "
        "  UNION ALL SELECT w.k + 1, f.parent FROM walk w "
        "  JOIN fs f ON f.id = w.id "
        "  WHERE f.parent <> w.id AND f.parent <> -1), "
        "plen AS (SELECT max(k) AS L FROM walk) "
        "SELECT (SELECT L FROM plen) - w.k AS step, w.id, f.dist "
        "FROM walk w JOIN fs f ON f.id = w.id"
    )
