from datax_spark.plans.jobspec import run_job, run_job_file  # noqa: F401
