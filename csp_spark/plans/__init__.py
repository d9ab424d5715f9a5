from .runtime import run, feedback_iterate, feedback_scan, dynamic_apply
