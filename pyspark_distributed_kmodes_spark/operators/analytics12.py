"""Round-10 staged r-suite: the next batch of genuinely-NEW ENGINE
SURFACE (per the round-9 verdict item #4 — real capabilities, never
window filler), keyed with the r-prefix so they sort AFTER every q*
key and cannot leak into the round-10 driver window (the round-3
z-suite precedent). Per the documented round-11 plan
(__spark_entry__.py), they rename into o-space (number preserved) when
they enter the round-11 window.

  r01  SQL SCRIPTING (Spark 4.1 BEGIN...END): DECLARE'd variables, a
       FOR cursor loop over an ordered bounded aggregate, an IF branch
       inside the loop — procedural control flow as a first-class
       front door; the oracle replays the fold with window functions.
  r02  VARIANT type (parse_json / variant_get): the semi-structured
       column type over the real events.props JSON column with typed
       path extraction; the oracle uses DuckDB's json_extract on the
       same strings.
  r03  XML EXPRESSIONS (to_xml / from_xml round-trip): the engine had
       only the XML file SOURCE (qj08); this exercises the expression
       surface — struct -> XML text -> parsed struct — with the oracle
       computing the same aggregate from the raw columns, so any
       round-trip corruption breaks the hash.
  r04  approx_top_k (native DataSketches frequent-items, Spark 4.1)
       with the exact GROUP BY as an in-hash audit twin — exact on a
       bounded domain because the sketch never evicts.
  r05  URL parsing (parse_url / try_parse_url): HOST + QUERY-param
       extraction over synthesized URLs with planted malformed rows;
       the oracle derives host/param from the source columns.
  r06  IDENTIFIER() dynamic table binding + LATERAL COLUMN ALIASES —
       analyzer-level ergonomics; the oracle inlines both, and a test
       pins that IDENTIFIER leaves no trace in the optimized plan.
  r07  UTF-8 validation (is_valid_utf8 / try_validate_utf8) over a
       binary column with deterministically planted corruption — the
       byte-level quarantine primitive of a raw-text ingest.

Investigated and honestly NOT implementable on this stack (recorded so
round 11 doesn't re-litigate): SQL MERGE INTO requires a catalog whose
tables implement SupportsRowLevelOperations; vanilla OSS Spark's
session catalog (parquet v1 tables) raises
UNSUPPORTED_FEATURE.TABLE_OPERATION — verified on the pinned Spark
4.1.2. Merge SEMANTICS remain fully covered by the DataFrame-native
CDC machinery (operators/cdc.py: q88/q89/qm28).

Engine style unchanged: pure JVM DataFrame/SQL ops, integer-exact
comparisons on knife edges (no double CAST boundaries), DECIMAL-summed
float aggregates, unique ORDER BY tie-breaks, bounded dictionaries
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.lineage import cut_lineage
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

# ---------------------------------------------------------------------------
# r01 — SQL scripting: BEGIN...END control flow over a bounded aggregate

# The loop walks the (bounded, ~5-row) per-priority order counts in
# priority order, maintaining an explicit rank, a rank-weighted count
# fold, and an above-average flag via IF — the kind of sequential
# bookkeeping SQL scripting exists for. All comparisons are integer
# (c * n_groups > total, never AVG-double casts) so both engines sit
# on the same arithmetic.
_R01_SCRIPT = """
BEGIN
  DECLARE ngrp BIGINT DEFAULT 0;
  DECLARE tot BIGINT DEFAULT 0;
  DECLARE rnk INT DEFAULT 0;
  DECLARE wsum BIGINT DEFAULT 0;
  DECLARE n_hi INT DEFAULT 0;
  SET ngrp = (SELECT COUNT(*) FROM r01_pr_counts);
  SET tot = (SELECT SUM(c) FROM r01_pr_counts);
  FOR r AS SELECT pr, c FROM r01_pr_counts ORDER BY pr DO
    SET rnk = rnk + 1;
    SET wsum = wsum + rnk * r.c;
    IF r.c * ngrp > tot THEN
      SET n_hi = n_hi + 1;
    END IF;
  END FOR;
  SELECT CAST(rnk AS INTEGER) AS n_groups,
         CAST(wsum AS BIGINT) AS rank_weighted_count,
         CAST(n_hi AS INTEGER) AS n_above_avg,
         CAST(tot AS BIGINT) AS n_orders;
END
"""

_R01_ORACLE = """
WITH g AS (
  SELECT o_orderpriority AS pr, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
), r AS (
  SELECT pr, c,
         ROW_NUMBER() OVER (ORDER BY pr) AS rnk,
         COUNT(*) OVER () AS ng,
         SUM(c) OVER () AS tot
  FROM g
)
SELECT CAST(MAX(rnk) AS INTEGER) AS n_groups,
       CAST(SUM(rnk * c) AS BIGINT) AS rank_weighted_count,
       CAST(SUM(CASE WHEN c * ng > tot THEN 1 ELSE 0 END) AS INTEGER) AS n_above_avg,
       CAST(SUM(c) AS BIGINT) AS n_orders
FROM r
"""


@query("r01_sql_scripting_controlflow", oracle=_R01_ORACLE, tags=("sql", "scripting"))
def r01_sql_scripting_controlflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4.1 BEGIN...END) as a first-class front
    door: DECLARE'd session-scoped variables, scalar-subquery SETs, a
    FOR cursor loop over the ordered per-priority counts, and an IF
    branch inside the loop maintain a rank-weighted fold that the
    oracle replays with ROW_NUMBER window arithmetic — so the scripting
    executor's iteration ORDER, variable updates, and branch decisions
    are all under the hash.

    Scale: the distributed work is ONE map-side-combinable groupBy
    (bounded ~5-row result), materialized once via cut_lineage so the
    script's three statements over it (COUNT, SUM, FOR) replay the
    5-row local relation instead of rescanning parquet; the loop then
    executes driver-side over the bounded cursor — the correct division
    of labor at 100 TB (aggregate on the cluster, control flow on
    bounded results).
    """
    o = table(spark, sf_dir, "orders")
    grp = (
        o.groupBy(F.col("o_orderpriority").alias("pr"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(cut_lineage)
    )
    grp.createOrReplaceTempView("r01_pr_counts")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(_R01_SCRIPT)


# ---------------------------------------------------------------------------
# r02 — VARIANT type: parse_json + typed variant_get path extraction

_R02_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(variant_get(parse_json(props), '$.k', 'bigint')) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN variant_get(parse_json(props), '$.k', 'bigint')
                          BETWEEN 25 AND 75 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid_k
FROM events GROUP BY event_type ORDER BY event_type
"""

_R02_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT)
                          BETWEEN 25 AND 75 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid_k
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("r02_variant_json_extraction", oracle=_R02_ORACLE, tags=("sql", "variant", "json"))
def r02_variant_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured extraction: the real events.props
    JSON strings are parsed into Spark 4's VariantType (parse_json) and
    the '$.k' path is extracted with an explicit target type
    (variant_get ... 'bigint'), then aggregated per event type — the
    open-schema column pattern a 100 TB ingest pipeline uses when
    payloads aren't worth pre-schematizing. The oracle extracts the
    same path with DuckDB's json_extract, so Variant's parse, path
    navigation, and numeric typing are all under the hash (q35/q36
    cover the string get_json_object path; this is the typed binary
    Variant encoding).

    Scale: one scan, one shuffle on the 5-value type key with map-side
    partial aggregation; parse_json/variant_get are JVM expressions
    inside whole-stage codegen — no Python, no second pass (Catalyst
    collapses the two variant_get calls over a shared parse via
    common-subexpression elimination).
    """
    e = table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events")
    return spark.sql(_R02_SQL)


# ---------------------------------------------------------------------------
# r03 — XML expression round-trip: to_xml -> from_xml -> aggregate

_R03_SQL = """
SELECT x.t AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(x.u) AS BIGINT) AS sum_user,
       CAST(SUM(x.e) AS BIGINT) AS sum_event_id
FROM (
  SELECT from_xml(to_xml(named_struct('t', event_type, 'u', user_id, 'e', event_id)),
                  't STRING, u BIGINT, e BIGINT') AS x
  FROM events
)
GROUP BY x.t ORDER BY event_type
"""

_R03_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(user_id) AS BIGINT) AS sum_user,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("r03_xml_expression_roundtrip", oracle=_R03_ORACLE, tags=("sql", "xml"))
def r03_xml_expression_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML EXPRESSION surface (the engine previously had only the XML
    file source, qj08): every event row is serialized to an XML string
    with to_xml(named_struct(...)) and immediately re-parsed with
    from_xml under an explicit schema; the aggregate is computed FROM
    THE PARSED STRUCT ONLY, while the oracle aggregates the raw
    columns — so any serialize/parse corruption (escaping, type
    coercion, field order) breaks the hash. Integer + string fields
    keep the round trip exact by construction (no float-to-text
    knife edges).

    Scale: one scan, JVM-side StaxXmlGenerator/Parser expressions in
    the projection (no Python), then the usual map-side-combinable
    5-key aggregate. The serialize+parse pair costs CPU per row but no
    extra shuffle or pass — the plan is scan -> project -> partial agg
    -> exchange -> final agg, identical to the raw-column twin.
    """
    e = table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events")
    return spark.sql(_R03_SQL)


# ---------------------------------------------------------------------------
# r04 — native DataSketches approx_top_k with an exact-count audit twin

# On a domain smaller than the sketch's tracked-item budget the
# frequent-items sketch is EXACT (no evictions ever happen), so the
# estimate is hash-gateable against a plain GROUP BY — the same
# audit-twin pattern as qm03 (theta) and qg07 (HLL bounds).
_R04_SQL = """
WITH sk AS (
  SELECT explode(approx_top_k_estimate(approx_top_k_accumulate(o_orderpriority), 5)) AS t
  FROM orders
), exact AS (
  SELECT o_orderpriority AS pr, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM orders GROUP BY 1
)
SELECT sk.t.item AS o_orderpriority,
       CAST(sk.t.count AS BIGINT) AS sketch_n,
       exact.exact_n AS exact_n,
       CAST(sk.t.count - exact.exact_n AS BIGINT) AS err
FROM sk JOIN exact ON exact.pr = sk.t.item
ORDER BY sketch_n DESC, o_orderpriority
"""

_R04_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS sketch_n,
       CAST(COUNT(*) AS BIGINT) AS exact_n,
       CAST(0 AS BIGINT) AS err
FROM orders GROUP BY 1 ORDER BY sketch_n DESC, o_orderpriority
"""


@query("r04_approx_top_k_audit", oracle=_R04_ORACLE, tags=("sketch", "audit"))
def r04_approx_top_k_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native DataSketches frequent-items top-k (Spark 4.1
    approx_top_k_accumulate/_estimate) with the exact GROUP BY as its
    audit twin IN the hash gate: on the 5-value priority domain the
    sketch never evicts, so sketch counts must equal exact counts and
    err must be identically zero — the oracle asserts exactly that by
    construction. This closes the sketch family's last gap (HLL, CMS,
    theta, KLL were covered; frequent-items was not).

    Scale: approx_top_k_accumulate is a mergeable partial aggregate
    (map-side sketches, one combine), so the pattern holds at 100 TB
    where the GROUP BY twin would still work but a 10^9-key domain
    would not — there the sketch's maxItemsTracked bounds memory while
    exact counting cannot; the audit twin quantifies the trade on a
    domain where truth is computable.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_R04_SQL)


# ---------------------------------------------------------------------------
# r05 — URL parsing (parse_url / try_parse_url) over synthesized URLs

_R05_SQL = """
WITH u AS (
  SELECT doc_id, source, lang,
         CASE WHEN doc_id % 13 = 0 THEN concat('::not a url::', CAST(doc_id AS STRING))
              ELSE concat('https://', source, '.example.org/d/', CAST(doc_id AS STRING),
                          '?lang=', lang, '&v=1')
         END AS url
  FROM documents
), p AS (
  SELECT doc_id, lang,
         coalesce(try_parse_url(url, 'HOST'), '(invalid)') AS host,
         try_parse_url(url, 'QUERY', 'lang') AS url_lang
  FROM u
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN url_lang = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_roundtrip
FROM p GROUP BY host ORDER BY host
"""

_R05_ORACLE = """
SELECT CASE WHEN doc_id % 13 = 0 THEN '(invalid)'
            ELSE source || '.example.org' END AS host,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_lang_roundtrip
FROM documents GROUP BY 1 ORDER BY host
"""


@query("r05_url_parsing", oracle=_R05_ORACLE, tags=("text", "url"))
def r05_url_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface (parse_url / try_parse_url, the try_ variant
    new in Spark 4.1): deterministic URLs are synthesized from document
    metadata (1-in-13 deliberately malformed), then HOST and a QUERY
    parameter are parsed BACK and aggregated — the oracle derives the
    same host/param directly from the source columns, so extraction
    correctness and the try_-on-malformed NULL contract are both under
    the hash. A web-corpus curation pipeline leans on exactly these
    expressions for per-host mixing and dedup keys.

    Scale: single scan, JVM parse expressions in the projection, one
    shuffle on the bounded host key with map-side combine.
    """
    d = table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    return spark.sql(_R05_SQL)


# ---------------------------------------------------------------------------
# r06 — SQL ergonomics: IDENTIFIER() binding + lateral column aliases

_R06_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS gross,
       CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS disc_amt,
       {net} AS net
FROM IDENTIFIER(r06_tbl)
GROUP BY l_returnflag ORDER BY l_returnflag
"""

_R06_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS gross,
       CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS disc_amt,
       {net} AS net
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query(
    "r06_identifier_lateral_alias",
    oracle=_R06_ORACLE.format(
        net="(CAST(floor((CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)"
        " - CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE))"
        " * 100.0 + 0.5) AS DOUBLE) / 100.0)"
    ),
    tags=("sql", "ergonomics"),
)
def r06_identifier_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two analyzer-level SQL ergonomics features under one hash:
    IDENTIFIER() binds the scanned table from a session variable
    (injection-safe dynamic identifiers — the sanctioned form of the
    string-concat SQL the verbatim front door qe13 forbids), and the
    `net` output is computed via LATERAL COLUMN ALIASES (`gross` and
    `disc_amt` referenced by alias in a sibling select item, not
    re-computed). The oracle inlines both: a static table name and the
    expanded expressions — so alias resolution must be pure sugar.

    Scale: IDENTIFIER resolves at analysis time; the physical plan is
    identical to the static-name query (scan -> partial agg -> exchange
    -> final agg) — pinned in tests by comparing the two plans.
    """
    from pyspark_distributed_kmodes_spark.functions.deterministic import sql_pround

    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql("DECLARE OR REPLACE VARIABLE r06_tbl STRING")
    spark.sql("SET VAR r06_tbl = 'lineitem'")
    return spark.sql(_R06_SQL.format(net=sql_pround("gross - disc_amt", 2)))


# ---------------------------------------------------------------------------
# r07 — UTF-8 validation expressions over a binary column

_R07_SQL = """
WITH b AS (
  SELECT source,
         CASE WHEN doc_id % 97 = 0 THEN concat(encode(text, 'UTF-8'), X'80')
              ELSE encode(text, 'UTF-8') END AS bin
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN is_valid_utf8(bin) THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid,
       CAST(SUM(CASE WHEN try_validate_utf8(bin) IS NULL THEN 0 ELSE length(try_validate_utf8(bin)) END) AS BIGINT) AS valid_chars
FROM b GROUP BY source ORDER BY source
"""

_R07_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
       CAST(SUM(CASE WHEN doc_id % 97 = 0 THEN 0 ELSE length(text) END) AS BIGINT) AS valid_chars
FROM documents GROUP BY source ORDER BY source
"""


@query("r07_utf8_validation", oracle=_R07_ORACLE, tags=("text", "binary"))
def r07_utf8_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 validation expressions (is_valid_utf8 / try_validate_utf8,
    Spark 4.0+) over a BINARY column — the first scrubbing pass of any
    100 TB raw-bytes text ingest. Corruption is planted deterministically
    (1-in-97 docs get a lone 0x80 continuation byte appended), so the
    oracle knows exactly which rows must fail validation and how many
    characters the valid ones decode to; the engine must agree from the
    bytes alone. try_validate_utf8's NULL-on-invalid contract feeds the
    quarantine pattern (qc01's malformed-CSV shape, at the byte level).

    Scale: single scan, JVM byte-inspection expressions, bounded
    source-key aggregate with map-side combine.
    """
    d = table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    return spark.sql(_R07_SQL)
