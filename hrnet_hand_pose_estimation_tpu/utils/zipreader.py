"""Read images/XML directly from zip archives.

Re-design of reference lib/utils/zipreader.py:23-70: paths using the
``archive.zip@inner/path.jpg`` convention read straight from the archive
(with a small per-archive handle cache), for datasets shipped zipped.
"""

from __future__ import annotations

import os
import zipfile
from typing import Dict

import cv2
import numpy as np

_cache: Dict[str, zipfile.ZipFile] = {}


def split_zip_path(path: str):
    if "@" not in path:
        return None, path
    archive, inner = path.split("@", 1)
    return archive, inner.lstrip("/")


def _archive(path: str) -> zipfile.ZipFile:
    if path not in _cache:
        _cache[path] = zipfile.ZipFile(path, "r")
    return _cache[path]


def imread(path: str, flags: int = cv2.IMREAD_COLOR) -> np.ndarray:
    """cv2.imread that understands ``archive.zip@inner.jpg`` paths."""
    archive, inner = split_zip_path(path)
    if archive is None:
        return cv2.imread(path, flags)
    data = _archive(archive).read(inner)
    return cv2.imdecode(np.frombuffer(data, np.uint8), flags)


def xmlread(path: str) -> bytes:
    archive, inner = split_zip_path(path)
    if archive is None:
        with open(path, "rb") as f:
            return f.read()
    return _archive(archive).read(inner)
