"""``csp.dataframe`` import-path parity (reference csp/dataframe.py):
the frame-of-edges DataFrame lives in csp_spark.frame; this module
mirrors the reference's import location."""

from .frame import TsFrame as DataFrame  # noqa: F401


class RealtimePerspectiveWidget:
    """reference csp/dataframe.py realtime widget: streams a
    csp.DataFrame into a live perspective widget. Notebook/UI path —
    needs perspective-python; gated at construction like the other
    perspective surfaces here."""

    def __init__(self, frame, *a, **kw):
        import perspective  # noqa: F401  gated optional dependency

        raise NotImplementedError(
            "perspective-python widget rendering is UI-only and not "
            "shipped here; use CspPerspectiveTable / the websocket "
            "table feed instead"
        )


__all__ = [n for n in dir() if not n.startswith("_")]
