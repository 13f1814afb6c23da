"""Engine function library: reusable DataFrame->DataFrame operators and
column expressions for the LLM-data-pipeline surface (SURVEY.md §2.11)
plus the shared deterministic hashing used for oracle-comparable
minhash/simhash."""

from cascading_hbase_spark.functions.hashing import hash64, HASH64_SQL  # noqa: F401
