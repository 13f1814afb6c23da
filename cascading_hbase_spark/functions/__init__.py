"""Engine function library: reusable DataFrame->DataFrame operators and
column expressions for the LLM-data-pipeline surface (SURVEY.md §2.11)
plus the shared deterministic hashing used for oracle-comparable
minhash/simhash."""

from cascading_hbase_spark.functions.hashing import (  # noqa: F401
    HASH64_SQL,
    hash64,
    use_fast_hash,
)
