"""napari GUI plugin for nellie_tpu.

Same tab set as the reference plugin (``/root/reference/nellie_napari``):
Home / File validation / Process / Visualize / Analyze / Settings, plus
third-party plugin discovery via the ``nellie_tpu.plugins`` entry-point
group.  Qt/napari are imported lazily so the core pipeline has no GUI
dependency; install the ``gui`` extra to use it.
"""


def _require_napari():
    try:
        import napari  # noqa: F401
        import qtpy  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "The nellie_tpu GUI requires napari and Qt. "
            "Install with: pip install 'nellie-tpu[gui]'"
        ) from exc


def NellieLoader(*args, **kwargs):  # noqa: N802 - napari manifest entry point
    _require_napari()
    from nellie_tpu.plugin.nellie_loader import NellieLoader as _Loader

    return _Loader(*args, **kwargs)
