"""Logging / timing utilities (reference: helmholtz_x/solver_utils.py:4-17).

In the single-controller JAX model there is one python process, so `info`
always prints; under multi-host `jax.distributed` it gates on process 0.
"""

from __future__ import annotations

import datetime

import jax


def info(msg: str):
    if jax.process_index() == 0:
        print(msg)


def start_time():
    return datetime.datetime.now()


def execution_time(start):
    info(f"Total Execution Time:  {datetime.datetime.now() - start}")
