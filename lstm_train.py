#!/usr/bin/env python
"""Public entry point: train the LSTM residual controller."""
from vla_touch_tpu.train.lstm_train import main

if __name__ == "__main__":
    main()
