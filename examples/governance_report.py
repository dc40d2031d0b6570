"""One-command data-governance report. Run:

    python examples/governance_report.py [sf_dir]

(defaults to /root/testdata/sf0.001). The audit pass a pipeline runs
before publishing a dataset: content digests for replication equality,
k-anonymity re-identification risk, functional-dependency (join-hazard)
discovery, distribution drift between cohorts, sentence-level duplicate
load, and embedding outliers — every section is a catalog query, so each
number here is DuckDB-oracle-checked in CI.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from sri_spark.plans import all_queries
    from sri_spark.session import get_spark

    spark = get_spark("sri-spark-governance")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    print("== table digest (replication-equality proof, 16 buckets) ==")
    q["governance_table_digest"](spark, sf_dir).orderBy("bucket").show(4)

    print("== k-anonymity risk by segment (QI: segment+nation+balance) ==")
    q["governance_k_anonymity"](spark, sf_dir).orderBy("segmento").show()

    print("== functional-dependency audit (m:m join hazards) ==")
    q["governance_fd_audit"](spark, sf_dir).orderBy("fd").show(truncate=False)

    print("== drift: view vs purchase value distributions (binned KS) ==")
    ks = q["stats_ks_two_sample"](spark, sf_dir)
    from pyspark.sql import functions as F

    ks.agg(F.max("ks_diff").alias("ks_statistic")).show()

    print("== sentence-grain duplicate load per source ==")
    q["dedup_sentence_exact"](spark, sf_dir).orderBy("source").show()

    print("== embedding outliers per label (z > 2 vs label centroid) ==")
    q["embeddings_outlier_zscore"](spark, sf_dir).orderBy("label").show(5)

    print("governance report complete — every section is oracle-checked in CI")


if __name__ == "__main__":
    main()
