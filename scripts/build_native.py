#!/usr/bin/env python
"""Build the native host-data-path library (eventclip_tpu/native/event_ops.cpp).

Usage: python scripts/build_native.py
The data pipeline also builds it automatically on first use (see
eventclip_tpu/native/__init__.py); this script exists for explicit installs
and CI, and fails loudly instead of falling back."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from eventclip_tpu import native  # noqa: E402

if not native.build(quiet=False):
    print("native build FAILED (is g++ on PATH?)", file=sys.stderr)
    sys.exit(1)
native.reset_for_tests()
assert native.available(), "built but not loadable"
print(f"built {native.LIB}")
