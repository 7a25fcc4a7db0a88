"""Tour of the round-10 staged engine surface (the r-suite,
operators/analytics12.py) as a user would drive it:

  1. SQL scripting (BEGIN...END) — variables, a FOR cursor loop and an
     IF branch folding a rank-weighted count over bounded aggregates.
  2. Variant — typed path extraction from the raw events.props JSON.
  3. XML expressions — to_xml -> from_xml round-trip feeding an
     aggregate computed only from the parsed structs.
  4. approx_top_k — native DataSketches frequent-items with its exact
     audit twin (err must be 0 on the bounded domain).
  5. URL parsing — HOST/QUERY-param extraction with try_parse_url's
     NULL contract quarantining malformed rows.
  6. IDENTIFIER() + lateral column aliases — dynamic table binding and
     alias-chained select items.
  7. UTF-8 validation — byte-level quarantine over a binary column
     with planted corruption.
  8. Bitmap distinct rollup — mergeable EXACT distinct counts; the
     OR-merged global must equal the per-segment rollup's union.
  9. Parameterized SQL — named :marker binding, injection-safe by
     construction (the hostile probe stays one literal).
  10. File-metadata provenance — _metadata.file_path/row_index audits
     over a partitioned sink.
  11. Passage chunking — overlapping token windows with per-chunk
     fingerprints, the RAG/training-data chunker.
  12. Streaming dedup with bounded state — planted +30 s duplicates
     dropped across micro-batches by dropDuplicatesWithinWatermark.

    python examples/sql_ergonomics_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.registry import load_all
from pyspark_distributed_kmodes_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sql-ergonomics-example")
    reg = load_all()

    print("== 1. SQL scripting: FOR/IF fold over per-priority counts ==")
    row = reg["qo01_sql_scripting_controlflow"].fn(spark, sf_dir)
    row.show()
    assert row.collect()[0].n_groups >= 1

    print("== 2. Variant: typed '$.k' extraction from events.props ==")
    reg["qo02_variant_json_extraction"].fn(spark, sf_dir).show()

    print("== 3. XML round-trip: aggregate from parsed structs only ==")
    reg["qo03_xml_expression_roundtrip"].fn(spark, sf_dir).show()

    print("== 4. approx_top_k vs exact counts (err pinned 0) ==")
    topk = reg["qo04_approx_top_k_audit"].fn(spark, sf_dir)
    topk.show()
    assert all(r.err == 0 for r in topk.collect())

    print("== 5. URL parsing: per-host rollup, malformed quarantined ==")
    reg["qo05_url_parsing"].fn(spark, sf_dir).show(8)

    print("== 6. IDENTIFIER() table binding + lateral column aliases ==")
    reg["qo06_identifier_lateral_alias"].fn(spark, sf_dir).show()

    print("== 7. UTF-8 validation over binary (planted corruption) ==")
    utf8 = reg["qo07_utf8_validation"].fn(spark, sf_dir)
    utf8.show(8)
    assert sum(r.n_invalid for r in utf8.collect()) > 0

    print("== 8. Bitmap distinct rollup (exact, mergeable) ==")
    bm = reg["qo08_bitmap_distinct_rollup"].fn(spark, sf_dir)
    bm.show()
    assert all(r.n_distinct_cust <= r.n_distinct_all for r in bm.collect())

    print("== 9. Parameterized SQL (hostile probe stays a literal) ==")
    ps = reg["qo09_parameterized_sql"].fn(spark, sf_dir)
    ps.show()
    assert all(r.n_probe_hits == 0 for r in ps.collect())

    print("== 10. File-metadata provenance over a partitioned sink ==")
    meta = reg["qo10_file_metadata_provenance"].fn(spark, sf_dir)
    meta.show()
    assert all(r.ri_contiguous == 1 for r in meta.collect())

    print("== 11. Passage chunking (W=32, stride 24) ==")
    reg["qo11_passage_chunking"].fn(spark, sf_dir).show(8)

    print("== 12. Streaming dedup within watermark (planted +30s dups) ==")
    dd = reg["qo12_stream_dedup_within_watermark"].fn(spark, sf_dir)
    dd.show()
    assert all(r.n_dropped == r.n_input - r.n_dedup for r in dd.collect())

    print("== 13. variant_explode over nested JSON arrays ==")
    reg["qo13_variant_explode_lateral"].fn(spark, sf_dir).show(6)

    print("== 14. Luhn checksum quarantine (planted digit corruption) ==")
    lu = reg["qo14_luhn_checksum_quarantine"].fn(spark, sf_dir)
    lu.show(8)
    assert sum(r.n_invalid for r in lu.collect()) > 0

    print("== 15. Stream-stream LEFT OUTER join (watermarked null emission) ==")
    oj = reg["qo15_stream_outer_join"].fn(spark, sf_dir)
    oj.show()
    row = oj.collect()[0]
    assert row.n_null_clicks >= 0 and row.n_matched_pairs >= row.n_matched_clicks

    print("== 16. State-store change feed (per-batch state evolution) ==")
    cf = reg["qo16_statestore_changefeed"].fn(spark, sf_dir)
    cf.show(15)
    assert {r.change_type for r in cf.collect()} == {"update"}

    spark.stop()


if __name__ == "__main__":
    main()
