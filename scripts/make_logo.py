"""Generate the plugin's Home-tab logo (nellie_tpu/plugin/logo.png).

An original vector-ish motif drawn with PIL: a branching organelle
network (nodes + tubules) over a soft radial glow — evoking the
mitochondrial networks the pipeline segments.  The reference ships a
binary ``logo.png`` (loaded at ``nellie_napari/nellie_home.py:64-71``);
this repo generates its own artwork so the asset is reproducible.

Run: ``python scripts/make_logo.py`` (writes the PNG next to the
plugin code; idempotent).
"""
import math
import os

from PIL import Image, ImageDraw, ImageFilter

SIZE = 512
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "nellie_tpu", "plugin", "logo.png")

# network topology: (y, x) nodes in unit coords + tubule edges
NODES = {
    "a": (0.50, 0.18), "b": (0.38, 0.34), "c": (0.62, 0.36),
    "d": (0.30, 0.55), "e": (0.52, 0.56), "f": (0.72, 0.58),
    "g": (0.40, 0.76), "h": (0.62, 0.78), "i": (0.22, 0.80),
    "j": (0.80, 0.30),
}
EDGES = [("a", "b"), ("a", "c"), ("b", "d"), ("b", "e"), ("c", "e"),
         ("c", "j"), ("d", "i"), ("e", "g"), ("e", "f"), ("f", "h"),
         ("g", "h"), ("d", "g")]

TEAL = (45, 212, 191)
BLUE = (56, 130, 246)
INK = (15, 23, 42)


def _px(p):
    return (p[1] * SIZE, p[0] * SIZE)


def _lerp(c1, c2, t):
    return tuple(int(a + (b - a) * t) for a, b in zip(c1, c2))


def main():
    img = Image.new("RGBA", (SIZE, SIZE), (0, 0, 0, 0))
    draw = ImageDraw.Draw(img)

    # soft radial glow backdrop
    glow = Image.new("RGBA", (SIZE, SIZE), (0, 0, 0, 0))
    gd = ImageDraw.Draw(glow)
    for r in range(SIZE // 2, 0, -8):
        a = int(70 * (1 - r / (SIZE / 2)) ** 2)
        gd.ellipse([SIZE / 2 - r, SIZE / 2 - r, SIZE / 2 + r, SIZE / 2 + r],
                   fill=(*_lerp(BLUE, INK, 0.6), a))
    img = Image.alpha_composite(img, glow.filter(ImageFilter.GaussianBlur(18)))
    draw = ImageDraw.Draw(img)

    # tubules: tapered segments with a slight sinusoidal wobble
    for k, (n1, n2) in enumerate(EDGES):
        p1, p2 = _px(NODES[n1]), _px(NODES[n2])
        steps = 24
        for s in range(steps):
            t0, t1 = s / steps, (s + 1) / steps
            mx = math.sin((t0 + k) * math.pi * 2) * 6
            x0 = p1[0] + (p2[0] - p1[0]) * t0 + mx
            y0 = p1[1] + (p2[1] - p1[1]) * t0
            x1 = p1[0] + (p2[0] - p1[0]) * t1 + mx
            y1 = p1[1] + (p2[1] - p1[1]) * t1
            w = 10 - 4 * abs(2 * t0 - 1)
            draw.line([x0, y0, x1, y1], fill=_lerp(TEAL, BLUE, t0), width=int(w))

    # nodes: glowing junctions
    for p in NODES.values():
        x, y = _px(p)
        for r, a in ((16, 60), (11, 140), (7, 255)):
            draw.ellipse([x - r, y - r, x + r, y + r],
                         fill=(*TEAL, a))

    img = img.filter(ImageFilter.GaussianBlur(0.8))
    out = os.path.normpath(OUT)
    img.save(out)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
