"""Destination sink adapters (K1-K3 parity renderers + gated clients)."""
