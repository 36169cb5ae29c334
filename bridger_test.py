#!/usr/bin/env python
"""Public entry point (reference README.md:110-111): evaluate a BRIDGeR
checkpoint.  Thin wrapper over vla_touch_tpu.eval.bridge_test."""
from vla_touch_tpu.eval.bridge_test import main

if __name__ == "__main__":
    main()
