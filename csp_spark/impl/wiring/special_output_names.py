"""csp.impl.wiring.special_output_names parity (reference
csp/impl/wiring/special_output_names.py:1)."""

UNNAMED_OUTPUT_NAME = "__csp__unnamed_output__"
