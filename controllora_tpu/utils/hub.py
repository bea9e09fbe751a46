"""Hub upload of trained artifacts.

TPU-native equivalent of the reference's end-of-training push (reference
train_text_to_image_control_lora.py:382-387 create_repo, 931-939 upload_folder).
`huggingface_hub` ships with transformers in this image; the import stays lazy so
hermetic/offline runs never touch it.
"""

from __future__ import annotations

import os
from typing import Optional

# Mirrors the reference's ignore_patterns=["step_*", "epoch_*"] (train:934-938),
# extended with this trainer's local-only outputs.
DEFAULT_IGNORE = [
    "step_*", "epoch_*", "checkpoint-*", "tb/*", "images/*",
    "metrics.jsonl", "profile/*",
]


def push_to_hub(
    folder: str,
    repo_id: Optional[str] = None,
    token: Optional[str] = None,
    private: bool = False,
    commit_message: str = "End of training",
) -> str:
    """Create (if needed) and upload `folder` to a hub model repo; returns its URL."""
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    repo_id = repo_id or os.path.basename(os.path.abspath(folder))
    repo = api.create_repo(repo_id, exist_ok=True, private=private)
    api.upload_folder(
        folder_path=folder,
        repo_id=repo.repo_id,
        commit_message=commit_message,
        ignore_patterns=DEFAULT_IGNORE,
    )
    return f"https://huggingface.co/{repo.repo_id}"
