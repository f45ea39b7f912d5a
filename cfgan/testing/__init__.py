"""Parity-testing harness: PyTorch oracles mirroring the reference's eager
semantics, used to pin cfgan's compiled steps to the reference trajectory.

torch is a test/benchmark oracle only (CPU); nothing in the cfgan runtime
imports this package.
"""
from cfgan.testing.oracles import (  # noqa: F401
    MnistCounterganOracle,
    MoonsCounterganOracle,
    TabularCounterganOracle,
    run_parity_trace,
)
