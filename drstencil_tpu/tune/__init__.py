"""Autotuner: config sweeps, roofline metrics, tuned-config ledger."""
