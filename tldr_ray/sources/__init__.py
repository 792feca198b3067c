from tldr_ray.sources.transcripts import (
    synth_conversation,
    synth_transcripts_table,
    transcripts_dataset,
    write_transcripts,
    documents_as_transcripts,
    TRANSCRIPT_SCHEMA,
)

__all__ = [
    "synth_conversation",
    "synth_transcripts_table",
    "transcripts_dataset",
    "write_transcripts",
    "documents_as_transcripts",
    "TRANSCRIPT_SCHEMA",
]
