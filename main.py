#!/usr/bin/env python3
"""Reference-compatible entry point: ``python3 main.py [action]`` with a
``config.yml`` in the working directory (see config.yml.example)."""

from gan_segmentation_tpu.apps.main import main

if __name__ == "__main__":
    main()
