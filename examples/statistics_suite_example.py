"""Statistical-testing tour: the round-6 staged inference suite — the
questions an analyst asks BEFORE trusting a difference: is the shift
real (Welch t / Mann-Kendall / sign test), how BIG is it in
sample-size-free units (Cohen's d, Wasserstein distance), does it hold
under pairing and blocking (McNemar, Cochran's Q, Friedman), and is
the variance assumption behind all of it even true (Brown-Forsythe,
Chebyshev coverage). Every operator is oracle-gated against DuckDB.

    python examples/statistics_suite_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.operators.analytics8 import (
    qj20_levene_test,
    qj23_mann_kendall,
    qj27_mcnemar_paired,
    qj48_welch_ttest,
)
from pyspark_distributed_kmodes_spark.operators.analytics9 import (
    qk01_friedman_test,
    qk02_cochran_q,
    qk07_effect_size_d,
    qk08_chebyshev_coverage,
    qk32_wasserstein_distance,
    qk34_shift_share,
)
from pyspark_distributed_kmodes_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("statistics-suite")

    print("== are en/de doc lengths different? (Welch t, unequal variances) ==")
    qj48_welch_ttest(spark, sf_dir).show()
    print("== ... and by how much? (Cohen's d — sample-size-free) ==")
    qk07_effect_size_d(spark, sf_dir).show()
    print("== ... and how far apart are the DISTRIBUTIONS? (exact 1-D Wasserstein) ==")
    qk32_wasserstein_distance(spark, sf_dir).show()

    print("== is daily volume trending? (Mann-Kendall, tie-corrected) ==")
    qj23_mann_kendall(spark, sf_dir).show()
    print("== did per-user conversion change half-over-half? (McNemar, paired) ==")
    qj27_mcnemar_paired(spark, sf_dir).show()
    print("== ... and week-over-week across four weeks? (Cochran's Q) ==")
    qk02_cochran_q(spark, sf_dir).show()

    print("== do priorities differ consistently across years? (Friedman blocks) ==")
    qk01_friedman_test(spark, sf_dir).show()
    print("== is the variance even homogeneous? (Brown-Forsythe) ==")
    qj20_levene_test(spark, sf_dir).show()
    print("== how heavy are the tails vs sigma-rules? (Chebyshev coverage) ==")
    qk08_chebyshev_coverage(spark, sf_dir).show()
    print("== where did the YoY change come from? (shift-share decomposition) ==")
    qk34_shift_share(spark, sf_dir).show()

    row = qk34_shift_share(spark, sf_dir).collect()[0]
    assert row.identity_gap == 0.0, "decomposition must be exact"
    print("statistics suite OK")


if __name__ == "__main__":
    main()
