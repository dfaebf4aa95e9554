"""CLI job entry points — the spark-submit surface.

Thin argparse wrappers over the library (``plans.bronze`` /
``plans.pipeline``), mirroring how reference users invoke their pipeline
(``spark-submit spark/silver/processor.py --ingest-date …``,
reference ``run.md``). All logic lives in the library; these modules only
parse arguments, build the session, and print the report.

    python -m home_credit_data_engineering_spark.jobs.ingest --help
    python -m home_credit_data_engineering_spark.jobs.silver --help
    python -m home_credit_data_engineering_spark.jobs.gold --help
"""
