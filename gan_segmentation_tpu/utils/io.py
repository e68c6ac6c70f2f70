"""Filesystem helpers (`utils.py:18-66` in the reference)."""

from os import listdir, walk
from os.path import isdir, isfile, islink, join, sep, splitext
from typing import List, Sequence


def list_subdirs(base_dir: str) -> List[str]:
    """`utils.py:9-15`."""
    return [f for f in listdir(base_dir) if isdir(join(base_dir, f))]


def list_files_with_ext(base_dir: str, valid_exts: Sequence[str],
                        recursive: bool = False) -> List[str]:
    """Sorted relative paths under ``base_dir`` with one of ``valid_exts``."""
    assert isdir(base_dir) or islink(base_dir), f"{base_dir} is not a directory"
    out = []
    base_len = len(base_dir.split(sep))
    # note: like the reference, the non-recursive variant still descends into
    # subdirectories (`utils.py:26` uses os.walk either way); ``recursive``
    # only toggles following symlinks (`utils.py:43`)
    for root, _dirs, fnames in sorted(walk(base_dir, followlinks=recursive)):
        rel_root = sep.join(root.split(sep)[base_len:])
        for fname in sorted(fnames):
            if not isfile(join(root, fname)):
                continue
            if splitext(fname.lower())[1] not in valid_exts:
                continue
            out.append(join(rel_root, fname) if rel_root else fname)
    return out


def list_images(base_dir: str,
                valid_exts=(".jpg", ".jpeg", ".png", ".bmp", ".ppm")) -> List[str]:
    return list_files_with_ext(base_dir, valid_exts)
