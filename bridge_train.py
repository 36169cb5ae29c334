#!/usr/bin/env python
"""Public entry point (reference README.md:106-108): train the BRIDGeR
controller.  Thin wrapper over vla_touch_tpu.train.bridge_train."""
from vla_touch_tpu.train.bridge_train import main

if __name__ == "__main__":
    main()
