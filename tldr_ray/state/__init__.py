from tldr_ray.state.checkpoint import (
    write_manifest,
    read_manifest,
    latest_checkpoint,
    fingerprint_input,
)

__all__ = [
    "write_manifest",
    "read_manifest",
    "latest_checkpoint",
    "fingerprint_input",
]
