from tldr_ray.sources.tabular import read_table
from tldr_ray.sources.transcripts import (
    synth_conversation,
    synth_transcripts_table,
    transcripts_dataset,
    write_transcripts,
    documents_as_transcripts,
    TRANSCRIPT_SCHEMA,
)

__all__ = [
    "read_table",
    "synth_conversation",
    "synth_transcripts_table",
    "transcripts_dataset",
    "write_transcripts",
    "documents_as_transcripts",
    "TRANSCRIPT_SCHEMA",
]
