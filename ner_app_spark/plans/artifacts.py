"""S6: model-artifact sink/source — the engine analog of the notebook's
``save_pretrained`` / ``from_pretrained`` round-trip
(/root/reference/notebooks/NER_NEREL_dataset.ipynb cells 11-12, which
save the fine-tuned rubert checkpoint and reload it for inference).

A "model" here is a directory of files (weights, vocab, config). The
engine stores one as a content-addressed artifact:

  * ``artifact_id`` = md5 of the canonical JSON of the per-file md5s +
    user metadata — identical bytes always produce the same id, so
    re-saving is a no-op (write-iff-absent, same S2 idempotence rule the
    analysis sink uses).
  * ``save_artifact`` is write-audit-publish: files stage into a temp
    dir, every staged file is re-hashed against the manifest (audit),
    and only then does one atomic rename publish the artifact. A killed
    save leaves only an unpublished temp dir, never a half-visible
    artifact.
  * ``load_artifact`` re-verifies every file hash on read — a corrupted
    store raises instead of silently feeding garbage weights.
  * ``ship_artifact`` distributes a published artifact to every executor
    via ``SparkContext.addFile(recursive=True)`` — the mechanism by
    which real model weights ride to a 1000-executor cluster (the
    production alternative is ``spark-submit --archives``); consumers
    resolve it executor-side with ``SparkFiles.get``.

The store lives on a shared/distributed filesystem in production (same
requirement as plans/pipeline.analysis_sink).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import SparkSession

MANIFEST = "MANIFEST.json"


def _md5(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


def _canonical(obj) -> bytes:
    return json.dumps(
        obj, ensure_ascii=False, sort_keys=True, separators=(",", ":")
    ).encode("utf-8")


def artifact_id_for(files: dict[str, bytes], meta: dict | None = None) -> str:
    """Deterministic content address of an artifact (files + metadata)."""
    manifest = {
        "files": {name: _md5(data) for name, data in files.items()},
        "meta": meta or {},
    }
    return _md5(_canonical(manifest))


def save_artifact(
    root: str, files: dict[str, bytes], meta: dict | None = None
) -> str:
    """Persist ``files`` as a content-addressed artifact under ``root``;
    returns the artifact_id. Idempotent: an already-published identical
    artifact is left untouched."""
    if not files:
        raise ValueError("artifact needs at least one file")
    for name in files:
        if os.sep in name or name in ("", ".", "..", MANIFEST):
            raise ValueError(f"bad artifact file name: {name!r}")
    meta = meta or {}
    aid = artifact_id_for(files, meta)
    final = os.path.join(root, aid)
    if os.path.exists(os.path.join(final, MANIFEST)):
        return aid  # write-iff-absent
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f"_tmp_{aid}_{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    manifest = {"files": {}, "meta": meta}
    for name, data in files.items():
        with open(os.path.join(tmp, name), "wb") as f:
            f.write(data)
        manifest["files"][name] = _md5(data)
    # audit: re-read every staged file and check its hash before publish
    for name, want in manifest["files"].items():
        with open(os.path.join(tmp, name), "rb") as f:
            got = _md5(f.read())
        if got != want:
            shutil.rmtree(tmp, ignore_errors=True)
            raise IOError(f"artifact audit failed for {name}: {got} != {want}")
    with open(os.path.join(tmp, MANIFEST), "w", encoding="utf-8") as f:
        f.write(_canonical(manifest).decode("utf-8"))
    try:
        os.rename(tmp, final)  # publish: one atomic namespace operation
    except OSError:
        # lost a race to a concurrent identical save: theirs is as good
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(final, MANIFEST)):
            raise
    return aid


def load_artifact(root: str, artifact_id: str) -> dict[str, bytes]:
    """Read an artifact back, verifying every file against its manifest
    hash AND the directory name against the manifest's content address."""
    final = os.path.join(root, artifact_id)
    with open(os.path.join(final, MANIFEST), encoding="utf-8") as f:
        manifest = json.load(f)
    if _md5(_canonical(manifest)) != artifact_id:
        raise IOError(f"artifact {artifact_id}: manifest does not match its id")
    out: dict[str, bytes] = {}
    for name, want in manifest["files"].items():
        with open(os.path.join(final, name), "rb") as f:
            data = f.read()
        if _md5(data) != want:
            raise IOError(f"artifact {artifact_id}: file {name} is corrupted")
        out[name] = data
    return out


def artifact_meta(root: str, artifact_id: str) -> dict:
    with open(os.path.join(root, artifact_id, MANIFEST), encoding="utf-8") as f:
        return json.load(f)["meta"]


def ship_artifact(spark: SparkSession, root: str, artifact_id: str) -> str:
    """Distribute a published artifact to all executors (addFile is
    idempotent per SparkContext). Returns the name consumers pass to
    ``SparkFiles.get`` inside executor code."""
    # verify before shipping: never distribute a corrupt artifact
    load_artifact(root, artifact_id)
    spark.sparkContext.addFile(os.path.join(root, artifact_id), recursive=True)
    return artifact_id


def executor_artifact_dir(artifact_id: str) -> str:
    """Executor-side: local path of a shipped artifact."""
    from pyspark import SparkFiles

    return SparkFiles.get(artifact_id)
