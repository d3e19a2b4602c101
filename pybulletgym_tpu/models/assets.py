"""Asset resolution for vendored MJCF model files."""

import os

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")


def asset_path(filename: str) -> str:
    p = os.path.join(_ASSET_DIR, filename)
    if not os.path.exists(p):
        raise FileNotFoundError(f"model asset {filename!r} not found in {_ASSET_DIR}")
    return p
