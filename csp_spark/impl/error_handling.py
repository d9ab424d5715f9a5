"""csp.impl.error_handling parity (reference
csp/impl/error_handling.py)."""

from ..core.surface import set_print_full_exception_stack  # noqa: F401


class ExceptionContext:
    """reference error_handling.py:12-40: a with-block that, unless
    PRINT_EXCEPTION_FULL_STACK is set, trims engine-internal frames
    from a propagating traceback so users see THEIR wiring line first.
    This engine's build errors already raise from the user's frame, so
    the default path is a no-op passthrough; the class-level flag is
    shared with set_print_full_exception_stack."""

    PRINT_EXCEPTION_FULL_STACK = False

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        return False  # never swallow


# ------------------------------------------------------------------
# pydantic ValidationError formatting helpers (reference
# error_handling.py:59-119): the csp-format build-diagnostic text a
# user debugging a ported program may import directly. ErrorDetails is
# a TypedDict — plain dict access at runtime, so no pydantic import is
# needed except for the version in the error URL.

import os as _os

INPUT_VALUE_TRUNCATE_LENGTH = int(
    _os.getenv("CSP_INPUT_VALUE_TRUNCATE_LENGTH", "300")
)


def fmt_loc(loc, prefix: str) -> str:
    """Dotted error location with dotted path segments backquoted
    (reference error_handling.py:62-73), with ``prefix`` elided."""
    parts = []
    for item in loc:
        s = str(item)
        parts.append(f"`{s}`" if isinstance(item, str) and "." in s else s)
    return ".".join(parts).replace(prefix, "")


def get_error_url(error_type: str) -> str:
    try:
        from pydantic.version import version_short

        v = version_short()
    except ImportError:  # pragma: no cover - pydantic ships here
        v = "latest"
    return f"https://errors.pydantic.dev/{v}/v/{error_type}"


def truncate_input_value(input_value: str) -> str:
    """Middle-elide long repr()s (reference error_handling.py:80-86):
    keep the head and tail around a ``...`` so both ends of the bad
    value stay visible."""
    n = len(input_value)
    if n <= INPUT_VALUE_TRUNCATE_LENGTH:
        return input_value
    mid = (INPUT_VALUE_TRUNCATE_LENGTH + 1) // 2
    left = max(mid - 3, 0)
    right = min(n - mid + 5, n)
    return f"{input_value[:left]}...{input_value[right:]}"


def fmt_line_error(error_details, prefix: str) -> str:
    """One error line in pydantic-core's own format (reference
    error_handling.py:89-108)."""
    error_type = error_details["type"]
    out = [
        fmt_loc(error_details["loc"], prefix),
        f"\n  {error_details['msg']} [type={error_type}",
    ]
    if error_type != "default_factory_not_called":
        value = error_details["input"]
        t = type(value)
        tname = (f"{t.__module__}." if t.__module__ != "builtins" else "")
        tname += t.__qualname__
        out.append(
            f", input_value={truncate_input_value(repr(value))}, "
            f"input_type={tname}"
        )
    out.append(
        f"]\n    For further information visit {get_error_url(error_type)}"
    )
    return "".join(out)


def fmt_errors(e, prefix: str) -> str:
    """Full ValidationError text (reference error_handling.py:111-119):
    a count-titled header then one fmt_line_error per error."""
    errors = e.errors()
    count = len(errors)
    plural = "" if count == 1 else "s"
    title = e.title.replace(prefix, "")
    lines = "\n".join(fmt_line_error(err, prefix) for err in errors)
    return f"{count} validation error{plural} for {title}\n{lines}"
