"""Headless GUI launcher: open napari with the Nellie TPU plugin docked.

Reference: ``/root/reference/main.py``.
"""


def main():
    import napari

    from nellie_tpu.plugin import NellieLoader

    viewer = napari.Viewer()
    loader = NellieLoader(viewer)
    viewer.window.add_dock_widget(loader, name="Nellie TPU", area="right")
    napari.run()


if __name__ == "__main__":
    main()
