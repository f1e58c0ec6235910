from .io import (
    TABLES,
    documents_as_corpus,
    load_table,
    load_tables,
    read_text_corpus,
    register_views,
    write_kv_text,
)

__all__ = [
    "TABLES",
    "documents_as_corpus",
    "load_table",
    "load_tables",
    "read_text_corpus",
    "register_views",
    "write_kv_text",
]
