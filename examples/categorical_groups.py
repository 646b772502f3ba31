"""Partial pooling across discrete groups: a Categorical kernel over a
group label multiplied with a continuous-input kernel, so groups share
statistical strength according to a learned/declared correlation (the
multi-task / coregionalization pattern)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(9)
    ngroup, nper = 3, 25
    # three related curves: common shape + small per-group offsets
    common = lambda t: np.sin(1.5 * t)
    offsets = [0.0, 0.3, -0.25]

    ts, gs, ys = [], [], []
    for g in range(ngroup):
        t = np.sort(rng.uniform(-3, 3, nper))
        ts.append(t)
        gs.append(np.full(nper, g))
        ys.append(common(t) + offsets[g] + 0.05 * rng.standard_normal(nper))
    x = lgp.asarray({
        't': np.concatenate(ts), 'g': np.concatenate(gs),
    })
    y = np.concatenate(ys)

    # inter-group correlation 0.8: strong but not total pooling
    C = 0.8 + 0.2 * np.eye(ngroup)
    kernel = lgp.ExpQuad(scale=1.5, dim='t') \
        * lgp.Categorical(cov=C, dim='g')

    gp = lgp.GP(kernel).addx(x, 'data')
    # predict group 2 on a dense grid
    tstar = np.linspace(-3, 3, 40)
    xs = lgp.asarray({'t': tstar, 'g': np.full(40, 2)})
    gp = gp.addx(xs, 'out')
    post = gp.predfromdata({'data': y}, 'out',
                           0.05 ** 2 * np.eye(y.size))

    want = common(tstar) + offsets[2]
    rmse = np.sqrt(np.mean((np.asarray(post.mean) - want) ** 2))
    print(f'group-2 rmse with pooling: {rmse:.3f}')
    assert rmse < 0.2

    # pooling helps: the same prediction from group-2 data ALONE is
    # noisier at the edges
    m = np.concatenate(gs) == 2
    gp1 = lgp.GP(lgp.ExpQuad(scale=1.5)) \
        .addx(np.concatenate(ts)[m], 'data').addx(tstar, 'out')
    post1 = gp1.predfromdata({'data': y[m]}, 'out',
                             0.05 ** 2 * np.eye(int(m.sum())))
    assert np.mean(np.asarray(post.sdev)) \
        < np.mean(np.asarray(post1.sdev))


if __name__ == '__main__':
    main()
