"""Pure-Python Qt/napari stand-ins for widget-level GUI smoke tests.

This image has no Qt bindings (qtpy/PyQt/PySide are not installed), so
the reference pattern of an offscreen ``QT_QPA_PLATFORM=offscreen`` test
cannot run here.  Instead these stubs implement the exact Qt surface the
plugin uses (signals as descriptors with synchronous ``emit``, widget
enable/visible state, layouts, tab widgets, a synchronous
``thread_worker``) so every tab can be *instantiated and driven* —
constructor errors, signal-wiring typos, missing attributes and
button-gating regressions all surface as real test failures.

``install()`` injects the stubs into ``sys.modules`` ONLY when the real
modules are absent, so the same tests run unchanged against real Qt in
an environment that has the ``gui`` extra.

Deliberately strict: widgets implement only the methods the plugin
calls (``grep``-derived) and raise AttributeError for anything else —
a silently-absorbing mock would defeat the point of the smoke test.
"""
from __future__ import annotations

import sys
import types


# --------------------------------------------------------------------------- QtCore
def _trim_args(slot, args):
    """PyQt/PySide call Python slots with at most as many signal args as
    the slot accepts; mimic that so no-arg slots connect to int signals."""
    import inspect
    try:
        sig = inspect.signature(slot)
    except (TypeError, ValueError):
        return args
    n = 0
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            n += 1
        elif p.kind == p.VAR_POSITIONAL:
            return args
    return args[:n]


class _BoundSignal:
    def __init__(self):
        self._slots = []

    def connect(self, slot):
        self._slots.append(slot)

    def disconnect(self, slot=None):
        if slot is None:
            self._slots.clear()
        else:
            self._slots.remove(slot)

    def emit(self, *args):
        for slot in list(self._slots):
            slot(*_trim_args(slot, args))


class Signal:
    """Class-attribute descriptor -> per-instance bound signal (Qt semantics)."""

    def __init__(self, *types):
        self._types = types

    def __set_name__(self, owner, name):
        self._name = "_signal_" + name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        sig = obj.__dict__.get(self._name)
        if sig is None:
            sig = _BoundSignal()
            obj.__dict__[self._name] = sig
        return sig


class _QtNamespace(types.SimpleNamespace):
    """Qt.* constants: any attribute resolves to a unique int sentinel."""

    def __getattr__(self, name):
        value = hash(name) & 0xFFFF
        setattr(self, name, value)
        return value


Qt = _QtNamespace()


class QObject:
    def __init__(self, parent=None):
        self._parent = parent

    def parent(self):
        return self._parent

    def setParent(self, parent):
        self._parent = parent

    def deleteLater(self):
        pass

    def blockSignals(self, blocked):
        prev = getattr(self, "_signals_blocked", False)
        self._signals_blocked = bool(blocked)
        return prev

    def signalsBlocked(self):
        return getattr(self, "_signals_blocked", False)


class QTimer(QObject):
    timeout = Signal()

    def __init__(self, parent=None):
        super().__init__(parent)
        self._active = False
        self._interval = 0

    def start(self, msec=0):
        self._active = True
        self._interval = msec

    def stop(self):
        self._active = False

    def isActive(self):
        return self._active

    @staticmethod
    def singleShot(msec, slot):
        slot()


class QThread(QObject):
    """start() runs run() synchronously — deterministic for tests."""

    finished = Signal()

    def __init__(self, parent=None):
        super().__init__(parent)
        self._ran = False

    def run(self):
        pass

    def start(self):
        self._ran = True
        self.run()
        self.finished.emit()

    def isRunning(self):
        return False

    def quit(self):
        pass

    def wait(self, msecs=None):
        return True


# --------------------------------------------------------------------------- QtWidgets
class QWidget(QObject):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._layout = None
        self._enabled = True
        self._visible = True
        self._tooltip = ""
        self._style = ""
        self._title = ""

    def setLayout(self, layout):
        self._layout = layout

    def layout(self):
        return self._layout

    def setEnabled(self, enabled):
        self._enabled = bool(enabled)

    def isEnabled(self):
        return self._enabled

    def setVisible(self, visible):
        self._visible = bool(visible)

    def isVisible(self):
        return self._visible

    def show(self):
        self._visible = True

    def hide(self):
        self._visible = False

    def setToolTip(self, text):
        self._tooltip = text

    def toolTip(self):
        return self._tooltip

    def setStyleSheet(self, style):
        self._style = style

    def setWindowTitle(self, title):
        self._title = title

    def setMinimumHeight(self, h):
        pass

    def setMaximumHeight(self, h):
        pass

    def setMinimumWidth(self, w):
        pass

    def setFixedWidth(self, w):
        pass

    def update(self):
        pass

    def adjustSize(self):
        pass


class _Layout:
    def __init__(self, parent=None):
        self._items = []

    def addWidget(self, widget, *args, **kwargs):
        self._items.append(widget)

    def addLayout(self, layout, *args, **kwargs):
        self._items.append(layout)

    def addStretch(self, stretch=0):
        pass

    def addSpacing(self, size):
        pass

    def setContentsMargins(self, *args):
        pass

    def setSpacing(self, spacing):
        pass

    def setAlignment(self, *args):
        pass

    def count(self):
        return len(self._items)

    def itemAt(self, i):
        item = self._items[i]
        return types.SimpleNamespace(widget=lambda: item if isinstance(item, QWidget) else None)

    def takeAt(self, i):
        item = self._items.pop(i)
        return types.SimpleNamespace(widget=lambda: item if isinstance(item, QWidget) else None)

    def clear(self):
        self._items.clear()

    # introspection for tests
    def widgets(self):
        out = []
        for item in self._items:
            if isinstance(item, QWidget):
                out.append(item)
            elif isinstance(item, _Layout):
                out.extend(item.widgets())
        return out


class QVBoxLayout(_Layout):
    pass


class QHBoxLayout(_Layout):
    pass


class QGridLayout(_Layout):
    def addWidget(self, widget, row=0, col=0, *args, **kwargs):
        self._items.append(widget)


class QFormLayout(_Layout):
    def addRow(self, label, field=None):
        if isinstance(label, str):
            lab = QLabel(label)
            self._items.append(lab)
        else:
            self._items.append(label)
        if field is not None:
            self._items.append(field)


class QLabel(QWidget):
    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text

    def setText(self, text):
        self._text = text

    def text(self):
        return self._text

    def setPixmap(self, pixmap):
        self._pixmap = pixmap

    def pixmap(self):
        return getattr(self, "_pixmap", None)

    def setAlignment(self, *args):
        pass

    def setWordWrap(self, wrap):
        pass

    def setOpenExternalLinks(self, open_):
        pass

    def setTextFormat(self, fmt):
        pass


class QPushButton(QWidget):
    clicked = Signal()

    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text

    def setText(self, text):
        self._text = text

    def text(self):
        return self._text

    def click(self):
        if self._enabled:
            self.clicked.emit()

    def setMenu(self, menu):
        self._menu = menu


class QCheckBox(QWidget):
    stateChanged = Signal(int)
    toggled = Signal(bool)

    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text
        self._checked = False

    def setChecked(self, checked):
        changed = self._checked != bool(checked)
        self._checked = bool(checked)
        if changed and not self.signalsBlocked():
            self.stateChanged.emit(2 if self._checked else 0)
            self.toggled.emit(self._checked)

    def isChecked(self):
        return self._checked

    def setText(self, text):
        self._text = text

    def text(self):
        return self._text


class QComboBox(QWidget):
    currentIndexChanged = Signal(int)
    currentTextChanged = Signal(str)

    def __init__(self, parent=None):
        super().__init__(parent)
        self._items = []
        self._index = -1

    def addItem(self, text):
        self._items.append(text)
        if self._index < 0:
            self._index = 0

    def addItems(self, texts):
        for t in texts:
            self.addItem(t)

    def clear(self):
        self._items.clear()
        self._index = -1

    def count(self):
        return len(self._items)

    def itemText(self, i):
        return self._items[i]

    def currentText(self):
        return self._items[self._index] if 0 <= self._index < len(self._items) else ""

    def currentIndex(self):
        return self._index

    def setCurrentIndex(self, index):
        if index != self._index:
            self._index = index
            if not self.signalsBlocked():
                self.currentIndexChanged.emit(index)
                self.currentTextChanged.emit(self.currentText())

    def setCurrentText(self, text):
        if text in self._items:
            self.setCurrentIndex(self._items.index(text))


class _SpinBase(QWidget):
    valueChanged = Signal(object)

    def __init__(self, parent=None):
        super().__init__(parent)
        self._value = 0
        self._min = 0
        self._max = 99

    def setRange(self, lo, hi):
        self._min, self._max = lo, hi

    def setMinimum(self, lo):
        self._min = lo

    def setMaximum(self, hi):
        self._max = hi

    def setSingleStep(self, step):
        pass

    def setSuffix(self, suffix):
        pass

    def setValue(self, value):
        value = min(max(value, self._min), self._max)
        if value != self._value:
            self._value = value
            if not self.signalsBlocked():
                self.valueChanged.emit(value)

    def value(self):
        return self._value


class QSpinBox(_SpinBase):
    def setValue(self, value):
        super().setValue(int(value))


class QDoubleSpinBox(_SpinBase):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._value = 0.0
        self._max = 99.99

    def setDecimals(self, d):
        pass

    def setValue(self, value):
        super().setValue(float(value))


class QLineEdit(QWidget):
    textChanged = Signal(str)
    editingFinished = Signal()

    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text

    def setText(self, text):
        if text != self._text:
            self._text = text
            if not self.signalsBlocked():
                self.textChanged.emit(text)

    def text(self):
        return self._text

    def finish_editing(self, text):
        """Test helper: type text + commit (Qt's editingFinished on Enter)."""
        self.setText(text)
        self.editingFinished.emit()

    def setPlaceholderText(self, text):
        pass

    def setReadOnly(self, ro):
        pass


class QTabWidget(QWidget):
    currentChanged = Signal(int)

    def __init__(self, parent=None):
        super().__init__(parent)
        self._tabs = []          # (widget, label, enabled)
        self._current = -1

    def addTab(self, widget, label):
        self._tabs.append([widget, label, True])
        if self._current < 0:
            self._current = 0
        return len(self._tabs) - 1

    def removeTab(self, index):
        del self._tabs[index]
        if self._current >= len(self._tabs):
            self._current = len(self._tabs) - 1

    def setTabEnabled(self, index, enabled):
        self._tabs[index][2] = bool(enabled)

    def isTabEnabled(self, index):
        return self._tabs[index][2]

    def widget(self, index):
        return self._tabs[index][0]

    def tabText(self, index):
        return self._tabs[index][1]

    def count(self):
        return len(self._tabs)

    def currentIndex(self):
        return self._current

    def setCurrentIndex(self, index):
        if index != self._current:
            self._current = index
            self.currentChanged.emit(index)


class QGroupBox(QWidget):
    def __init__(self, title="", parent=None):
        super().__init__(parent)
        self._group_title = title


class QScrollArea(QWidget):
    def setWidget(self, widget):
        self._inner = widget

    def setWidgetResizable(self, resizable):
        pass


class QTableWidgetItem:
    def __init__(self, text=""):
        self._text = text

    def text(self):
        return self._text

    def setText(self, text):
        self._text = text


class QTableWidget(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._cells = {}
        self._rows = 0
        self._cols = 0

    def setRowCount(self, n):
        self._rows = n

    def setColumnCount(self, n):
        self._cols = n

    def rowCount(self):
        return self._rows

    def columnCount(self):
        return self._cols

    def setItem(self, row, col, item):
        self._cells[(row, col)] = item

    def item(self, row, col):
        return self._cells.get((row, col))

    def setHorizontalHeaderLabels(self, labels):
        self._hheaders = list(labels)

    def setVerticalHeaderLabels(self, labels):
        self._vheaders = list(labels)

    def clear(self):
        self._cells.clear()

    def resizeColumnsToContents(self):
        pass


class QFileDialog:
    """Static pickers return empty (user cancelled); tests monkeypatch."""

    @staticmethod
    def getOpenFileName(parent=None, caption="", directory="", filter=""):
        return "", ""

    @staticmethod
    def getOpenFileNames(parent=None, caption="", directory="", filter=""):
        return [], ""

    @staticmethod
    def getSaveFileName(parent=None, caption="", directory="", filter=""):
        return "", ""

    @staticmethod
    def getExistingDirectory(parent=None, caption="", directory=""):
        return ""


class QMenu(QWidget):
    def __init__(self, title="", parent=None):
        super().__init__(parent)
        self._actions = []

    def addAction(self, action):
        self._actions.append(action)

    def addMenu(self, menu):
        self._actions.append(menu)


class QApplication:
    _instance = None

    def __init__(self, argv=None):
        QApplication._instance = self

    @staticmethod
    def instance():
        return QApplication._instance

    @staticmethod
    def processEvents():
        pass


class QAction(QObject):
    triggered = Signal()

    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text


# --------------------------------------------------------------------------- napari
def thread_worker(func=None, **kwargs):
    """Synchronous stand-in for napari's @thread_worker: calling the
    decorated function returns a worker; start() runs it inline and
    routes the outcome through returned/finished or errored."""

    def decorate(fn):
        def make_worker(*args, **kw):
            return _FakeWorker(fn, args, kw)

        return make_worker

    if func is not None:
        return decorate(func)
    return decorate


class _FakeWorker:
    def __init__(self, fn, args, kw):
        self._fn, self._args, self._kw = fn, args, kw
        self.returned = _BoundSignal()
        self.yielded = _BoundSignal()
        self.finished = _BoundSignal()
        self.errored = _BoundSignal()

    def start(self):
        try:
            result = self._fn(*self._args, **self._kw)
            if hasattr(result, "__next__"):  # generator worker
                for item in result:
                    self.yielded.emit(item)
                result = None
            self.returned.emit(result)
        except Exception as exc:  # noqa: BLE001 — routed to errored, Qt-style
            self.errored.emit(exc)
        finally:
            self.finished.emit()

    def quit(self):
        pass


def show_info(message):
    pass


class _Events:
    def __getattr__(self, name):
        sig = _BoundSignal()
        setattr(self, name, sig)
        return sig


class _LayerList(list):
    def __init__(self):
        super().__init__()
        self.selection = types.SimpleNamespace(active=None)
        self.events = _Events()

    def __contains__(self, layer):
        return any(l is layer for l in self)

    def remove(self, layer):
        for i, l in enumerate(self):
            if l is layer or getattr(l, "name", None) == layer:
                del self[i]
                return
        raise ValueError(layer)

    def __getitem__(self, key):
        if isinstance(key, str):
            for l in self:
                if getattr(l, "name", None) == key:
                    return l
            raise KeyError(key)
        return super().__getitem__(key)


class _FakeLayer(types.SimpleNamespace):
    pass


class FakeViewer:
    """Viewer double covering the attributes the plugin touches."""

    def __init__(self):
        self.layers = _LayerList()
        self.dims = types.SimpleNamespace(
            ndisplay=2, current_step=(0, 0, 0, 0), events=_Events())
        self.scale_bar = types.SimpleNamespace(visible=False, unit=None)
        self.cursor = types.SimpleNamespace(position=(0.0, 0.0, 0.0, 0.0))
        self.status = ""
        self.window = types.SimpleNamespace(
            add_dock_widget=lambda *a, **k: None)
        self.text_overlay = types.SimpleNamespace(visible=False, text="")
        self._keybinds = {}

    def _add(self, kind, data, **kwargs):
        layer = _FakeLayer(kind=kind, data=data, name=kwargs.get("name", kind),
                           visible=kwargs.get("visible", True), scale=kwargs.get("scale"),
                           events=_Events(), **{k: v for k, v in kwargs.items()
                                                if k not in ("name", "visible", "scale")})
        self.layers.append(layer)
        return layer

    def add_image(self, data, **kwargs):
        return self._add("image", data, **kwargs)

    def add_labels(self, data, **kwargs):
        return self._add("labels", data, **kwargs)

    def add_tracks(self, data, **kwargs):
        return self._add("tracks", data, **kwargs)

    def add_points(self, data, **kwargs):
        return self._add("points", data, **kwargs)

    def bind_key(self, key, func=None, overwrite=False):
        if func is None:
            def deco(f):
                self._keybinds[key] = f
                return f
            return deco
        self._keybinds[key] = func

    def screenshot(self, path=None, canvas_only=True):
        import numpy as np
        return np.zeros((4, 4, 4), np.uint8)


# --------------------------------------------------------------------------- install
def install():
    """Inject stub qtpy/napari into sys.modules when the real ones are
    absent.  Returns True if stubs are active (tests may branch)."""
    try:
        import qtpy  # noqa: F401
        return False
    except ImportError:
        pass

    this = sys.modules[__name__]

    qtpy_mod = types.ModuleType("qtpy")
    qtpy_mod.API_NAME = "stub"

    qtcore = types.ModuleType("qtpy.QtCore")
    for name in ("Qt", "Signal", "QObject", "QTimer", "QThread"):
        setattr(qtcore, name, getattr(this, name))

    qtwidgets = types.ModuleType("qtpy.QtWidgets")
    for name in ("QWidget", "QLabel", "QPushButton", "QCheckBox", "QComboBox",
                 "QSpinBox", "QDoubleSpinBox", "QLineEdit", "QVBoxLayout",
                 "QHBoxLayout", "QGridLayout", "QFormLayout", "QTabWidget",
                 "QGroupBox", "QScrollArea", "QTableWidget", "QTableWidgetItem",
                 "QFileDialog", "QMenu", "QApplication"):
        setattr(qtwidgets, name, getattr(this, name))

    qtgui = types.ModuleType("qtpy.QtGui")
    qtgui.QAction = QAction

    class QPixmap:
        """File-backed pixmap stand-in: isNull() mirrors real Qt (null
        when the path doesn't load), scaled() returns self."""

        def __init__(self, path=None):
            import os

            self._ok = bool(path) and os.path.isfile(str(path))

        def isNull(self):
            return not self._ok

        def scaled(self, *args, **kwargs):
            return self

        def scaledToHeight(self, *args, **kwargs):
            return self

    qtgui.QPixmap = QPixmap

    qtpy_mod.QtCore = qtcore
    qtpy_mod.QtWidgets = qtwidgets
    qtpy_mod.QtGui = qtgui

    napari_mod = types.ModuleType("napari")
    napari_qt = types.ModuleType("napari.qt")
    napari_threading = types.ModuleType("napari.qt.threading")
    napari_threading.thread_worker = thread_worker
    napari_utils = types.ModuleType("napari.utils")
    napari_notifications = types.ModuleType("napari.utils.notifications")
    napari_notifications.show_info = show_info
    napari_qt.threading = napari_threading
    napari_utils.notifications = napari_notifications
    napari_mod.qt = napari_qt
    napari_mod.utils = napari_utils
    napari_mod.Viewer = FakeViewer

    sys.modules.update({
        "qtpy": qtpy_mod,
        "qtpy.QtCore": qtcore,
        "qtpy.QtWidgets": qtwidgets,
        "qtpy.QtGui": qtgui,
        "napari": napari_mod,
        "napari.qt": napari_qt,
        "napari.qt.threading": napari_threading,
        "napari.utils": napari_utils,
        "napari.utils.notifications": napari_notifications,
    })
    return True
