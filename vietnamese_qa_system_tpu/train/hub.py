"""HF Hub push surface (offline-safe).

Capability of the reference's ``save_push`` — merge the adapter, export,
and push to a private Hub repo + log checkpoint artifacts
(reference src/models/trainer.py:726-774).  This environment has zero
network egress, so the push degrades to a recorded intent: the export is
written locally and a ``push_manifest.json`` captures exactly what would
have been uploaded (repo id, privacy, file list, sizes).  When
``huggingface_hub`` is importable and a token/network exist, the same
call uploads for real.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


def _manifest(export_dir: str, repo_id: str, private: bool, reason: str) -> dict:
    files = []
    for root, _, names in os.walk(export_dir):
        for n in names:
            if n == "push_manifest.json":
                continue
            p = os.path.join(root, n)
            files.append(
                {
                    "path": os.path.relpath(p, export_dir),
                    "bytes": os.path.getsize(p),
                }
            )
    return {
        "repo_id": repo_id,
        "private": private,
        "pushed": False,
        "reason": reason,
        "time": time.time(),
        "files": sorted(files, key=lambda f: f["path"]),
    }


def push_to_hub(
    export_dir: str,
    repo_id: str,
    *,
    private: bool = True,
    token: Optional[str] = None,
    commit_message: str = "model update",
    dry_run: bool = False,
) -> dict:
    """Upload ``export_dir`` to the Hub, or record the intent offline.

    Returns {"pushed": bool, "reason": str, ...}; never raises on network
    or dependency failures (training must not die on a push)."""
    if not os.path.isdir(export_dir):
        raise ValueError(f"export dir {export_dir!r} does not exist")
    token = token or os.environ.get("HF_TOKEN")
    reason = None
    if dry_run:
        reason = "dry run requested"
    elif token is None:
        reason = "no token (set HF_TOKEN or pass token=)"
    if reason is None:
        try:
            from huggingface_hub import HfApi

            api = HfApi(token=token)
            api.create_repo(repo_id, private=private, exist_ok=True)
            api.upload_folder(
                folder_path=export_dir,
                repo_id=repo_id,
                commit_message=commit_message,
            )
            return {"repo_id": repo_id, "private": private, "pushed": True}
        except Exception as e:  # offline / missing dep / auth failure
            reason = f"upload failed: {type(e).__name__}: {e}"
    manifest = _manifest(export_dir, repo_id, private, reason)
    with open(os.path.join(export_dir, "push_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
