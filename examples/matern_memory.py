"""How fast each kernel forgets: posterior predictive uncertainty one
step beyond the data recovers the prior much faster for rough Matérn
processes than for the analytic ExpQuad (the reference's examples/m.py
theme: "Matérn processes prefer to forget")."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    x = np.linspace(0, 5, 25)
    y = np.sin(x)
    xstar = np.array([6.0, 8.0])   # 1 and 3 data-steps beyond the end

    def forget(kernel):
        gp = lgp.GP(kernel).addx(x, 'd').addx(xstar, 's')
        u = gp.predfromdata({'d': y}, 's', 1e-4 * np.eye(x.size))
        return np.asarray(u.sdev)  # prior sd is 1 for all these kernels

    kernels = {
        'OU (Matern 1/2)': lgp.OrnsteinUhlenbeck(),
        'Matern 3/2': lgp.Maternp(p=1),
        'Matern 5/2': lgp.Maternp(p=2),
        'ExpQuad': lgp.ExpQuad(),
    }
    sd1 = {}
    for name, k in kernels.items():
        s = forget(k)
        sd1[name] = s[0]
        print(f'{name:18s} sd at +1: {s[0]:.3f}  at +3: {s[1]:.3f}')

    # rougher processes forget faster: monotone in smoothness
    assert sd1['OU (Matern 1/2)'] > sd1['Matern 3/2'] \
        > sd1['Matern 5/2'] > sd1['ExpQuad']
    return sd1


if __name__ == '__main__':
    main()
