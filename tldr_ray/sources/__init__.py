from tldr_ray.sources.tabular import (list_new_files, mark_processed,
                                      read_new_files, read_table)
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
    "read_new_files",
    "list_new_files",
    "mark_processed",
    "synth_conversation",
    "synth_transcripts_table",
    "transcripts_dataset",
    "write_transcripts",
    "documents_as_transcripts",
    "TRANSCRIPT_SCHEMA",
]
