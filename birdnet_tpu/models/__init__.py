"""Reference-shaped model generators (BirdNET v2.4 / v3.0 / Perch v2 / meta)."""

from . import birdnet_v24, birdnet_v30, meta, perch_v2  # noqa: F401
