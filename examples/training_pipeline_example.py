"""End-to-end training-data pipeline: compose the engine's operators
into the standard pre-training cleaning cascade —

    quality filter → exact dedup → MinHash near-dedup → cluster →
    keep canonical docs → decontaminate vs eval → pack into sequences

Every stage is the library API (not the registry queries), showing how
a user chains them on their own corpus DataFrame:

    python examples/training_pipeline_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.graph import connected_components
from pyspark_distributed_kmodes_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
from pyspark_distributed_kmodes_spark.session import get_spark
from pyspark_distributed_kmodes_spark.sources.tables import table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-pipeline")
    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate: length + lexical diversity (a52's filter stack)
    words = F.split("text", " ")
    docs = docs.filter(
        (F.size(words) >= 20)
        & (F.size(F.array_distinct(words)).cast("double") / F.size(words) > 0.3)
    )
    n1 = docs.count()

    # 2. exact dedup: keep lowest doc_id per content fingerprint (q56)
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(words)), " "))
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    docs = (
        docs.withColumn("fingerprint", fp)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    n2 = docs.count()

    # 3. MinHash near-dedup → candidate pairs → connected components →
    #    keep the lowest doc_id of every near-duplicate cluster (a63/a97/a98)
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)
    cands = lsh_candidate_pairs(sigs)
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
    pairs = cands.select("doc_a", "doc_b", (agree / 32.0).alias("est_jaccard")).filter(
        F.col("est_jaccard") >= 0.5
    )
    comps = connected_components(pairs, src="doc_a", dst="doc_b")
    losers = (
        comps.filter(F.col("vertex") != F.col("component"))
        .select(F.col("vertex").alias("doc_id"))
    )
    docs = docs.join(losers, "doc_id", "left_anti")
    n3 = docs.count()

    # 4. decontamination: drop training docs sharing any trigram shingle
    #    with the held-out eval split (a75's sweep, src2 as "eval")
    from pyspark_distributed_kmodes_spark.operators.dedup import shingle_df

    train = docs.filter(F.col("source") != "src2")
    eval_ = docs.filter(F.col("source") == "src2")
    train_sh = shingle_df(train)
    eval_sh = shingle_df(eval_).select("shingle").distinct()
    contaminated = train_sh.join(F.broadcast(eval_sh), "shingle").select("doc_id").distinct()
    clean = train.join(contaminated, "doc_id", "left_anti")
    n4 = clean.count()

    # 5. pack into 256-word training sequences per source shard (b06)
    n_words = F.size(F.split("text", " ")).cast("bigint")
    w2 = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = (
        clean.select("doc_id", "source", n_words.alias("n_words"))
        .withColumn("start", F.sum("n_words").over(w2) - F.col("n_words"))
        .withColumn("pack_id", F.floor(F.col("start") / 256))
    )
    n_packs = packed.select("source", "pack_id").distinct().count()

    print(f"corpus:          {n0} docs")
    print(f"quality gate:    {n1} docs ({n0 - n1} dropped)")
    print(f"exact dedup:     {n2} docs ({n1 - n2} dropped)")
    print(f"near dedup:      {n3} docs ({n2 - n3} dropped)")
    print(f"decontaminated:  {n4} train docs ({n3 - eval_.count() - n4} dropped)")
    print(f"packed into:     {n_packs} sequences of ~256 words")
    spark.stop()


if __name__ == "__main__":
    main()
