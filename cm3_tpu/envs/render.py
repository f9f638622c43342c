"""Episode rendering.

The reference renders particle episodes with a pyglet/OpenGL viewer
(``multiagent/rendering.py``) — out of scope for a TPU fleet (SURVEY.md
§2.4 item 3).  These ASCII/text renderers fill the same debugging role
headlessly: call on host-fetched states, print or collect frames.
"""

from __future__ import annotations

import numpy as np


def render_checkers(state) -> str:
    """world [R,C,3] + loc [N,2] -> grid text: 'g'/'o' uncollected cells,
    '.' empty, '#' border, digits for agents."""
    world = np.asarray(state.world)
    loc = np.asarray(state.loc)
    rows, cols, _ = world.shape
    out = []
    for r in range(rows):
        line = []
        for c in range(cols):
            ch = "."
            if world[r, c, 2] == 1:
                ch = "#"
            elif world[r, c, 0] == -1:
                ch = "g"
            elif world[r, c, 1] == -1:
                ch = "o"
            for i in range(loc.shape[0]):
                if loc[i, 0] == r and loc[i, 1] == c:
                    ch = str(i)
            line.append(ch)
        out.append("".join(line))
    return "\n".join(out)


def render_particle(state, width: int = 41) -> str:
    """pos/landmarks in [-1,1]^2 -> character map ('0'..'9' agents,
    'A'..'J' landmarks)."""
    pos = np.asarray(state.pos)
    lms = np.asarray(state.landmarks)
    h = w = width
    grid = [[" "] * w for _ in range(h)]

    def put(xy, ch):
        c = int(round((xy[0] + 1) / 2 * (w - 1)))
        r = int(round((1 - (xy[1] + 1) / 2) * (h - 1)))
        if 0 <= r < h and 0 <= c < w:
            grid[r][c] = ch

    for i, lm in enumerate(lms):
        put(lm, chr(ord("A") + i))
    for i, p in enumerate(pos):
        put(p, str(i))
    border = "+" + "-" * w + "+"
    return "\n".join([border] + ["|" + "".join(row) + "|" for row in grid]
                     + [border])


def render_roadway(state, cfg, length_cells: int = 80) -> str:
    """Top-down road: rows are sublanes (top = sublane 15), '=' lane
    center markers, digits for cars, 'X' for crashed cars."""
    x = np.asarray(state.x)
    sub = np.asarray(state.sublane)
    removed = np.asarray(state.removed)
    collided = np.asarray(state.collided)
    n_sub = cfg.n_sublanes
    grid = [[" "] * length_cells for _ in range(n_sub)]
    for lane in range(cfg.n_lanes):
        center = lane * cfg.sublanes_per_lane + cfg.sublanes_per_lane // 2
        for c in range(0, length_cells, 4):
            grid[n_sub - 1 - center][c] = "-"
    for i in range(len(x)):
        c = int(x[i] / cfg.total_length * (length_cells - 1))
        c = min(max(c, 0), length_cells - 1)
        r = n_sub - 1 - int(sub[i])
        grid[r][c] = "X" if collided[i] else (
            "x" if removed[i] else str(i))
    border = "+" + "=" * length_cells + "+"
    return "\n".join([border] + ["|" + "".join(row) + "|" for row in grid]
                     + [border])
