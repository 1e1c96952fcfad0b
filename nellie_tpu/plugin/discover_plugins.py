"""Third-party extension discovery via the ``nellie_tpu.plugins``
entry-point group (reference: ``nellie_napari/discover_plugins.py``).

Extensions are callables taking the NellieLoader; they appear under a
"Nellie TPU plugins" submenu of napari's Plugins menu.  The legacy
``nellie.plugins`` group is also scanned so reference-era extensions
keep working.
"""
from __future__ import annotations

from importlib.metadata import entry_points

PLUGIN_GROUPS = ("nellie_tpu.plugins", "nellie.plugins")


def discover_nellie_plugins() -> dict:
    plugins = {}
    try:
        available = entry_points()
        for group in PLUGIN_GROUPS:
            if isinstance(available, dict):  # py<3.10 shape
                group_eps = available.get(group, [])
            else:
                group_eps = available.select(group=group)
            for ep in group_eps:
                try:
                    plugins[ep.name] = ep.load()
                except Exception as exc:  # noqa: BLE001 - isolate bad plugins
                    print(f"Error loading Nellie plugin {ep.name}: {exc}")
    except Exception as exc:  # noqa: BLE001
        print(f"Error discovering Nellie plugins: {exc}")
    return plugins


def add_nellie_plugins_to_menu(nellie_loader):
    from qtpy.QtWidgets import QMenu
    from qtpy.QtGui import QAction

    plugins = discover_nellie_plugins()
    if not plugins:
        return

    menu_bar = nellie_loader.viewer.window._qt_window.menuBar()
    plugins_menu = None
    for action in menu_bar.actions():
        if action.text() == "&Plugins":
            plugins_menu = action.menu()
            break
    if plugins_menu is None:
        print("Plugins menu not found")
        return

    nellie_menu = None
    for action in plugins_menu.actions():
        if action.text() == "Nellie TPU plugins":
            nellie_menu = action.menu()
            break
    if nellie_menu is None:
        nellie_menu = QMenu("Nellie TPU plugins", nellie_loader.viewer.window._qt_window)
        plugins_menu.addMenu(nellie_menu)

    for plugin_name, plugin_func in plugins.items():
        action = QAction(plugin_name, nellie_loader.viewer.window._qt_window)
        action.triggered.connect(lambda checked, func=plugin_func: func(nellie_loader))
        nellie_menu.addAction(action)
