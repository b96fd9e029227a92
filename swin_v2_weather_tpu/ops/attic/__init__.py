"""Retired A/B-measurement kernels, kept runnable for archaeology.

Everything here LOST its chip A/B against the committed default and is
preserved only as measurement infrastructure (ROADMAP.md round-3 attention
campaign): importable, parity-tested, env-selectable — but not on any
default path. Do not grow this package; cut or win."""
