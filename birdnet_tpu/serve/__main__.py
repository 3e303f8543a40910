"""``python -m birdnet_tpu.serve`` entry point."""

from .server import main

if __name__ == "__main__":
    raise SystemExit(main())
