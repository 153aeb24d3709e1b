"""spark-submit entry point for the pipeline job.

Usage (the north rule's submission shape):

    spark-submit --py-files dist/sparkcollector.zip \
        BENCH/job_submit.py --input <transcripts.parquet> --out <dir>

The module body lives in sparkcollector.job; this file exists because
spark-submit takes a script path, not ``-m``.
"""

from sparkcollector.job import main

if __name__ == "__main__":
    main()
