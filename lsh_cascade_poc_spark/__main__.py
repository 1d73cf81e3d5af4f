"""python -m lsh_cascade_poc_spark == the spark-submit job entry (job.py)."""

from .job import main

main()
