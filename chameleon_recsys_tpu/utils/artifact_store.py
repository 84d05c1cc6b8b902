"""Artifact-store seam for remote model/metric synchronization.

The reference couples its trainers to Google Cloud Storage: recursive
directory upload of metric CSV/JSON artifacts every N evals and warm-start by
downloading a previous job's checkpoints
(nar_module/nar/gcs_utils.py:22-109, nar_utils.py:42-77,
nar_trainer_gcom.py:450-459, 527-556).  Here the same workflow shape is a
small protocol with a local-filesystem default, so any remote backend (GCS,
S3, NFS) plugs in without touching the harness — and tests exercise the full
warm-start/periodic-sync path against a tmpdir.
"""
from __future__ import annotations

import shutil
from pathlib import Path
from typing import List, Optional, Protocol, runtime_checkable


@runtime_checkable
class ArtifactStore(Protocol):
    """upload/download a directory tree; existence check.

    ``filename_pattern`` filters like the reference's GCS helpers
    (gcs_utils.py:22-40: only files whose name contains the pattern move).
    """

    def upload_dir(
        self, local_dir, remote_path: str, filename_pattern: Optional[str] = None
    ) -> List[str]:
        ...

    def download_dir(
        self, remote_path: str, local_dir, filename_pattern: Optional[str] = None
    ) -> List[str]:
        ...

    def exists(self, remote_path: str) -> bool:
        ...


class LocalArtifactStore:
    """Filesystem-backed store: ``remote_path`` is a path under ``root``.

    The default backend (artifacts are plain files); also the test double for
    any remote implementation.
    """

    def __init__(self, root):
        self.root = Path(root)

    def _resolve(self, remote_path: str) -> Path:
        return self.root / remote_path

    @staticmethod
    def _copy_tree(src: Path, dst: Path, filename_pattern) -> List[str]:
        copied = []
        if not src.exists():
            return copied
        for item in sorted(src.rglob("*")):
            if not item.is_file():
                continue
            if filename_pattern and filename_pattern not in item.name:
                continue
            target = dst / item.relative_to(src)
            target.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(item, target)
            copied.append(str(target))
        return copied

    def upload_dir(self, local_dir, remote_path, filename_pattern=None):
        return self._copy_tree(
            Path(local_dir), self._resolve(remote_path), filename_pattern
        )

    def download_dir(self, remote_path, local_dir, filename_pattern=None):
        return self._copy_tree(
            self._resolve(remote_path), Path(local_dir), filename_pattern
        )

    def exists(self, remote_path) -> bool:
        return self._resolve(remote_path).exists()


def warm_start_model_dir(
    store: ArtifactStore, remote_path: str, model_dir
) -> List[str]:
    """Download a previous run's checkpoint files into ``model_dir`` before
    training (the reference's --warmup_model_dir flow,
    nar_trainer_gcom.py:450-459, restricted there to checkpoint files — here
    the checkpoint is the single full-unit pickle/orbax dir, so the whole
    tree syncs)."""
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    if not store.exists(remote_path):
        return []
    return store.download_dir(remote_path, model_dir)
