#!/usr/bin/env python
"""Public entry point (reference README.md:116-118): evaluate an LSTM
controller checkpoint.  Thin wrapper over vla_touch_tpu.eval.lstm_step_test."""
from vla_touch_tpu.eval.lstm_step_test import main

if __name__ == "__main__":
    main()
