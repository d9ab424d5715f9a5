from .runtime import run, feedback_iterate, dynamic_apply
