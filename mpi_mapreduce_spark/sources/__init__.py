from mpi_mapreduce_spark.sources.io import (
    read_bucketed,
    read_kv_text,
    read_table,
    read_text_corpus,
    write_bucketed,
    write_kv_text,
    write_table,
)

__all__ = [
    "read_text_corpus",
    "read_kv_text",
    "write_kv_text",
    "read_table",
    "write_table",
    "write_bucketed",
    "read_bucketed",
]
