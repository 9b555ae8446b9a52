"""spark-submit driver shim for fuzi_spark.job.

spark-submit takes a SCRIPT as its application file (it has no `-m
module` mode), and fuzi_spark/job.py itself can't be that script: it
lives inside the package and uses relative imports, which fail when the
file is executed outside package context. This shim is the standard
production shape — a top-level file shipped next to the zipped package:

    zip -r fuzi_spark.zip fuzi_spark
    spark-submit --py-files fuzi_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        submit_job.py \
        --input s3://bucket/docs_parquet --output /warehouse/extracted \
        --n-buckets 4096 --doc-type html

`import fuzi_spark` resolves from the --py-files zip on every executor
and on the driver. Exercised end-to-end (real spark-submit subprocess,
scratch cwd, no repo checkout on sys.path) by
tests/test_spark_pipeline.py::TestSparkSubmitDeployment.
"""
import sys

from fuzi_spark.job import main

if __name__ == "__main__":
    sys.exit(main())
