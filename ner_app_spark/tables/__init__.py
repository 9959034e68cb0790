from .icelite import (  # noqa: F401
    CommitConflict,
    IceTable,
    ScanReport,
    publish_pipeline_tables,
)
