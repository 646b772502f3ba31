"""The same model expressed two ways — a process-level linear
combination (deftransf) and an element-level one (addtransf) — give
identical posteriors (the reference's examples/g.py and l.py theme)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(-2, 2, 25))
    y = 0.7 * np.sin(2 * x) + 0.3 * x + 0.05 * rng.standard_normal(x.size)
    noise = 0.05**2 * np.eye(x.size)

    # formulation 1: combine at the PROCESS level
    gp1 = lgp.GP()
    gp1 = gp1.defproc('wiggle', lgp.ExpQuad(scale=0.5))
    gp1 = gp1.defproc('trend', lgp.ExpQuad(scale=5.0))
    gp1 = gp1.deftransf('sum', {'wiggle': 1.0, 'trend': 1.0})
    gp1 = gp1.addx(x, 'data', proc='sum')
    gp1 = gp1.addx(x, 'wigglepart', proc='wiggle')
    u1 = gp1.predfromdata({'data': y}, 'wigglepart', noise)

    # formulation 2: combine at the ELEMENT level
    gp2 = lgp.GP()
    gp2 = gp2.defproc('wiggle', lgp.ExpQuad(scale=0.5))
    gp2 = gp2.defproc('trend', lgp.ExpQuad(scale=5.0))
    gp2 = gp2.addx(x, 'w', proc='wiggle')
    gp2 = gp2.addx(x, 't', proc='trend')
    gp2 = gp2.addlintransf(lambda w, t: w + t, ['w', 't'], 'data')
    u2 = gp2.predfromdata({'data': y}, 'w', noise)

    np.testing.assert_allclose(np.asarray(u1.mean), np.asarray(u2.mean),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(u1.sdev), np.asarray(u2.sdev),
                               rtol=1e-5, atol=1e-8)
    print('process-level and element-level formulations agree')
    return u1, u2


if __name__ == '__main__':
    main()
