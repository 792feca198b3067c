from tldr_ray.state.incremental import (read_aggregate_state,
                                        update_running_aggregate)
from tldr_ray.state.checkpoint import (
    write_manifest,
    read_manifest,
    latest_checkpoint,
    fingerprint_input,
)

__all__ = [
    "read_aggregate_state",
    "update_running_aggregate",
    "write_manifest",
    "read_manifest",
    "latest_checkpoint",
    "fingerprint_input",
]
