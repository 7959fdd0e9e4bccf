from .catalog import IcebergCatalog, PathCatalog, resolve_catalog
from .tables import load_table
from .transcripts import synth_transcripts, transcripts_from_events, with_tag

__all__ = [
    "synth_transcripts",
    "transcripts_from_events",
    "with_tag",
    "load_table",
    "IcebergCatalog",
    "PathCatalog",
    "resolve_catalog",
]
