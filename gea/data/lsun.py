"""LSUN dataset support (reference C9 [M]: the upstream trainers accept
``--dataset lsun --lsun_classes <name>`` backed by torchvision's LMDB
reader; SURVEY.md §2 C9).

TPU-native shape: LSUN ships as one LMDB per class holding raw JPEG/WebP
blobs. Rather than re-implementing an LMDB page cache on the hot path, we
export each requested class ONCE to a plain image folder (webp blobs as
.webp files — they decode through the PIL backend; jpgs via the native C++
pool) and then reuse the battle-tested folder backends (native pool / PIL
threads / grain / RAM cache). The export is idempotent and cached next to
the LMDB; steady-state training reads only the folder.

If ``lmdb`` is not importable (this image does not bake it) and the export
has not been materialized, we fail with an actionable message instead of
silently training on nothing.
"""

from __future__ import annotations

import os
from typing import List


def _lsun_lmdb_dir(dataroot: str, cls: str) -> str:
    for name in (f"{cls}_train_lmdb", f"{cls}_train", cls):
        p = os.path.join(dataroot, name)
        if os.path.isdir(p) and os.path.exists(os.path.join(p, "data.mdb")):
            return p
    return ""


def _export_dir(dataroot: str, cls: str) -> str:
    return os.path.join(dataroot, f"{cls}_train_images")


def export_class(dataroot: str, cls: str, limit: int = 0) -> str:
    """Export one LSUN class LMDB to a folder of image files; returns the
    folder. Idempotent: a `.complete` marker skips re-export."""
    out = _export_dir(dataroot, cls)
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    lmdb_path = _lsun_lmdb_dir(dataroot, cls)
    if not lmdb_path:
        raise FileNotFoundError(
            f"no LSUN lmdb for class {cls!r} under {dataroot!r} "
            f"(expected {cls}_train_lmdb/data.mdb)"
        )
    try:
        import lmdb
    except ImportError as e:
        raise RuntimeError(
            "lsun export needs the 'lmdb' package, which this image does "
            "not provide. Export the LMDB to an image folder elsewhere "
            f"(any file layout under {out!r} + touch {marker!r}), or point "
            "--dataset folder --dataroot at an existing image dump."
        ) from e
    os.makedirs(out, exist_ok=True)
    env = lmdb.open(
        lmdb_path, max_readers=8, readonly=True, lock=False, readahead=False
    )
    n = 0
    with env.begin(write=False) as txn:
        for key, val in txn.cursor():
            # LSUN blobs are raw encoded images (webp in the official dump)
            ext = ".webp" if val[:4] == b"RIFF" else ".jpg"
            name = key.decode("ascii", "replace")[:64]
            with open(os.path.join(out, f"{n:08d}_{name}{ext}"), "wb") as f:
                f.write(val)
            n += 1
            if limit and n >= limit:
                break
    env.close()
    if n == 0:
        # A truncated/corrupt LMDB must not leave a .complete marker —
        # it would permanently short-circuit re-export and hand the
        # folder backends an empty directory.
        raise ValueError(
            f"LSUN export from {lmdb_path!r} produced 0 images "
            "(corrupt or empty LMDB?)"
        )
    with open(marker, "w") as f:
        f.write(f"{n}\n")
    return out


def resolve_lsun_root(cfg) -> str:
    """Folder of images for cfg.lsun_classes, exporting LMDBs as needed.

    Accepts, per class, either a plain image subfolder (``<class>/`` with
    image files) or an LSUN LMDB (``<class>_train_lmdb/``). Multiple
    classes resolve to their common dataroot with per-class folders, which
    the folder backends walk recursively.
    """
    classes: List[str] = [
        c.strip() for c in getattr(cfg, "lsun_classes", "bedroom").split(",")
        if c.strip()
    ]
    if not classes:
        raise ValueError("--lsun_classes resolved to an empty class list")
    roots = []
    for cls in classes:
        plain = os.path.join(cfg.dataroot, cls)
        if os.path.isdir(plain) and not os.path.exists(
            os.path.join(plain, "data.mdb")
        ):
            roots.append(plain)
        else:
            roots.append(export_class(cfg.dataroot, cls))
    if len(roots) == 1:
        return roots[0]
    # Multi-class: symlink-farm the class folders under one root so the
    # recursive folder walkers see exactly the requested classes.
    farm = os.path.join(cfg.dataroot, "_lsun_" + "_".join(sorted(classes)))
    os.makedirs(farm, exist_ok=True)
    for r in roots:
        link = os.path.join(farm, os.path.basename(r))
        if not os.path.lexists(link):
            os.symlink(r, link)
    return farm
