"""Script + record the 150-frame playground input (mario.rs:318-343
record/replay role).  Writes assets/playground_input.bin and prints the
resulting trajectory so the run can be sanity-checked.

Run: python tools/record_playground.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mrt.runtime.input import InputCollection, InputRecorder  # noqa: E402
from mrt.scenes.playground import Playground  # noqa: E402

FRAMES = 150


def script(frame) -> InputCollection:
    inp = InputCollection()
    if frame < 12:                       # settle/spawn
        pass
    elif frame < 45:                     # run +x up the ramp
        inp.stick_x = 1.0
    elif frame < 52:                     # jump off platform A's far edge
        inp.stick_x = 1.0
        inp.button_a = frame < 48
    elif frame < 85:                     # run back -x across the level
        inp.stick_x = -1.0
    elif frame < 110:                    # diagonal toward the platform
        inp.stick_x = -1.0
        inp.stick_y = 1.0
    elif frame < 114:                    # jump onto the glass platform
        inp.stick_y = 0.5
        inp.button_a = True
    elif frame < 122:                    # drift over it
        inp.stick_y = 0.3
    else:                                # ride the platform
        pass
    return inp


def main():
    scene = Playground()
    rec = InputRecorder()
    for f in range(FRAMES):
        inp = script(f)
        rec.record(inp)
        st = scene.tick(f, inp)
        if f % 10 == 0 or (45 <= f <= 52) or (105 <= f <= 115):
            print(f"f={f:3d} pos=({st.pos[0]:6.2f},{st.pos[1]:5.2f},"
                  f"{st.pos[2]:6.2f}) grounded={st.grounded}")
    out = os.path.join(os.path.dirname(__file__), "..", "assets",
                       "playground_input.bin")
    rec.save(out)
    print(f"wrote {FRAMES} frames -> {out}")


if __name__ == "__main__":
    main()
