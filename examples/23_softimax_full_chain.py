"""The complete SoftiMAX beamline as a coherent wave chain.

The full reference 14_SoftiMAX / speed-test-3 workload (undulator
filament wave -> FE slit -> M1 -> collimated-PGM mono (M2 + blazed
grating, cff=1.6, fixed exit) -> M3 -> exit slit -> M4/M5 KB pair ->
focal images around the sample), built by tools/bench_softimax.py with
pilot-ray placement and per-stage Kirchhoff kernel selection.  This
example runs it at a reduced sample count, saves the three focal images
and a 3D glow view of the beamline.

At full size (2e5 samples/wave) the chain runs in 8.4 s on one TPU v5e
vs the published 17.5 s on one A100 (see PERF.md); physics parity vs
the reference's own chain is pinned by tests/test_softimax_chain.py.

Run: python examples/23_softimax_full_chain.py
     XRT_TPU_PLATFORM=cpu python examples/23_softimax_full_chain.py
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

from xrt_tpu.config import select_platform
select_platform()

import numpy as np

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 3000 if SMOKE else 60000
NSCR = 16 if SMOKE else 48


def main():
    from bench_softimax import build_chain, D_FOCUS
    run_chain = build_chain(nrays=NRAYS, n_scr=NSCR, verbose=not SMOKE)
    imgs = run_chain()
    for i, dq in enumerate(D_FOCUS):
        print(f'focus {dq:+.0f} mm: total {imgs[i].sum():.4g}, '
              f'peak/mean {imgs[i].max() / imgs[i].mean():.2f}')

    if not SMOKE:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        for i, (ax, dq) in enumerate(zip(axes, D_FOCUS)):
            ax.imshow(imgs[i], origin='lower', extent=[-50, 50, -50, 50],
                      cmap='inferno')
            ax.set_title(f'focus {dq:+.0f} mm')
            ax.set_xlabel('x (um)')
        axes[0].set_ylabel('z (um)')
        fig.tight_layout()
        fig.savefig('23_softimax_focus.png', dpi=110)

    # 3D overview of the layout (glow wireframes, no rays at wave sizes)
    from xrt_tpu.glow import export_html
    el = dict(run_chain.elements)
    el.pop('src')
    elements = {k: v for k, v in el.items() if k != 'screens'}
    for i, scr in enumerate(run_chain.elements['screens']):
        elements[f'focus{i}'] = scr
    fn = export_html(elements=elements,
                     fileName='23_softimax_layout.html')
    print('wrote', fn)


if __name__ == '__main__':
    main()
