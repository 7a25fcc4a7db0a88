"""Event-analytics tour: the product-analytics suite over one event
log — funnel, conversion latency, engagement, behavioral profiles,
similarity, and the stream-disorder audit that sizes a watermark.

    python examples/event_analytics_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.operators.events import (
    qe09_event_funnel,
    qe10_dau_wau_stickiness,
    qe12_event_transition_matrix,
    qe21_sax_similar_users,
    qe23_ranking_cohorts,
    qe29_disorder_audit,
    qe32_time_to_convert,
)
from pyspark_distributed_kmodes_spark.operators.relational4 import qe31_weekly_ohlc
from pyspark_distributed_kmodes_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("event-analytics")

    print("== funnel: who progresses view -> click -> purchase, in order ==")
    qe09_event_funnel(spark, sf_dir).show()
    print("== how long conversion takes (microseconds) ==")
    qe32_time_to_convert(spark, sf_dir).show(truncate=False)
    print("== engagement: DAU/WAU stickiness per week ==")
    qe10_dau_wau_stickiness(spark, sf_dir).show(5)
    print("== what users do next: top transition probabilities ==")
    qe12_event_transition_matrix(spark, sf_dir).orderBy(
        "prob", ascending=False
    ).show(5)
    print("== behavioral profiles: top-3 ranking cohorts ==")
    qe23_ranking_cohorts(spark, sf_dir).orderBy("n_users", ascending=False).show(5)
    print("== users with the same activity SHAPE (SAX-blocked) ==")
    qe21_sax_similar_users(spark, sf_dir).show(5)
    print("== weekly order-value candlesticks ==")
    qe31_weekly_ohlc(spark, sf_dir).show(5)
    print("== how disordered is this stream (sizes the watermark) ==")
    qe29_disorder_audit(spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
