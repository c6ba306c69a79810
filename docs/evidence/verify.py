"""Out-of-band mathematical verification of the Jubjub parameters.

Python replacement for the reference's SageMath SafeCurves evidence
(/root/reference/doc/evidence/verify.sage, parameter files p,l,a,d,x0,y0...)
and the rigidity derivation (/root/reference/doc/derive/derive.sage).

Run: python docs/evidence/verify.py   (pure Python ints, no JAX; ~seconds)

Checks:
  1. primality of q (base field) and r (subgroup order)     [Miller-Rabin]
  2. 2-adic structure: q-1 = 2^32*odd, r == 3 (mod 4)
  3. completeness: a=-1 is a square, d and -d are non-squares
  4. generator is on the curve with order exactly 8r, and the Hasse bound
     pins the curve order to exactly 8r (16r exceeds the Hasse interval)
  5. Montgomery equivalence: A = 2(a+d)/(a-d) == 40962 (derive.sage's
     rigid parameter; the curve is the one derived there)
  6. twist order 2(q+1) - 8r = 4 * prime  (twist security)
  7. embedding degree sanity: q^k != 1 (mod r) for all k <= 10^5
     (transfer attacks require a tiny embedding degree)
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, __file__.rsplit("/docs/", 1)[0])

from jubjub_tpu import oracle as o  # noqa: E402


def is_probable_prime(n: int, rounds: int = 40) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    rng = random.Random(0x4A4A)  # deterministic
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def check(name, cond):
    print(("PASS" if cond else "FAIL"), name)
    if not cond:
        raise SystemExit(f"verification failed: {name}")


def main():
    q, r = o.Q, o.R

    check("q is prime", is_probable_prime(q))
    check("r is prime", is_probable_prime(r))

    t = q - 1
    s = 0
    while t % 2 == 0:
        t //= 2
        s += 1
    check("q - 1 = 2^32 * odd (S = 32)", s == 32)
    check("r == 3 (mod 4)", r % 4 == 3)

    def is_square(x, p):
        return x % p == 0 or pow(x, (p - 1) // 2, p) == 1

    check("a = -1 is a square mod q (required for the a=-1 formulas)",
          is_square(-1, q))
    check("d is a non-square (completeness of unified addition)",
          not is_square(o.EDWARDS_D, q))
    check("-d is a non-square", not is_square(-o.EDWARDS_D, q))

    g = o.GENERATOR
    check("generator is on the curve", o.is_on_curve(g))
    check("[8r]G == O", o.mul(g, 8 * r) == o.IDENTITY)
    check("[4r]G != O", o.mul(g, 4 * r) != o.IDENTITY)
    check("[8]G != O (order has full r part)", o.mul(g, 8) != o.IDENTITY)
    # order(G) divides 8r, doesn't divide 4r or 8 -> order == 8r exactly
    import math
    hasse_hi = q + 1 + 2 * math.isqrt(q) + 2
    check("Hasse: 16r exceeds the Hasse interval, so #E = 8r exactly",
          8 * r <= hasse_hi < 16 * r)

    # Montgomery form A = 2(a+d)/(a-d) with a = -1
    A = 2 * (-1 + o.EDWARDS_D) * pow(-1 - o.EDWARDS_D, -1, q) % q
    check("Montgomery A == 40962 (rigid derivation, derive.sage)", A == 40962)

    tw = 2 * (q + 1) - 8 * r  # curve order + twist order = 2(q+1)
    check("twist order = 4 * prime (twist security)",
          tw % 4 == 0 and is_probable_prime(tw // 4))

    k, x = 0, 1
    ok = True
    for k in range(1, 100_001):
        x = x * q % r
        if x == 1:
            ok = False
            break
    check("embedding degree > 10^5 (transfer resistance)", ok)

    print("ALL PARAMETER CHECKS PASSED")


if __name__ == "__main__":
    main()
