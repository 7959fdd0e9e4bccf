from .transcripts import synth_transcripts, transcripts_from_events, with_tag
from .tables import load_table

__all__ = ["synth_transcripts", "transcripts_from_events", "with_tag", "load_table"]
