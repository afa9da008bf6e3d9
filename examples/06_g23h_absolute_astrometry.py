"""Flagship absolute-astrometry fit: the G23H composite likelihood.

Mirrors the reference tutorials `docs/src/g23h.md` / `g23h-example.md`:
one `G23HObs` fuses Hipparcos + Gaia DR2 + DR3 proper motions, the
DR3-DR2 scaled position, the RUWE/UEVA excess-noise channel, the
Hipparcos IAD residual channel, and the Gaia RV-variability channel.

The catalog row is read from the reference's real feather subset
fixture when present (HIP 384), else a synthetic row with the same
schema. Sampling uses parallel tempering with the variational leg —
the production configuration for mass-inclination posteriors, which
are often ridge-shaped.

Run: python examples/06_g23h_absolute_astrometry.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.astrom import (
    G23HObs,
    GaiaCatalogFitObs,
    HipparcosIADObs,
    load_g23h_catalog_row,
)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "tests"))
from test_astrom import write_synth_iad  # noqa: E402  (fixture generators)
from test_g23h import g23h_catalog_row, synth_gost_dr23  # noqa: E402

REAL_FIXTURE = "/root/reference/test/G23H-test-subset.feather"
REAL_GOST = ("/root/reference/docs/src/"
             "GOST-1.1927097109938027-1.5368044203832403-dr3.csv")


def build_model(tmpdir="/tmp/g23h_example"):
    os.makedirs(tmpdir, exist_ok=True)

    if os.path.exists(REAL_FIXTURE):
        row = load_g23h_catalog_row(REAL_FIXTURE, hip_id=384)
        print(f"using real catalog row: HIP 384 / Gaia {row['gaia_source_id']}")
        gaia_sol = dict(
            ra=row["ra"], dec=row["dec"], parallax=row["parallax"],
            pmra=row["pmra_dr3"], pmdec=row["pmdec_dr3"],
            ra_error=row["ra_error"], dec_error=row["dec_error"],
            parallax_error=row["parallax_error"],
            pmra_error=row["pmra_dr3_error"],
            pmdec_error=row["pmdec_dr3_error"],
        )
    else:
        row = g23h_catalog_row()
        print("reference fixture not found; using synthetic catalog row")
        gaia_sol = dict(
            ra=158.3, dec=-40.4, parallax=50.0, pmra=0.0, pmdec=0.0,
            ra_error=0.03, dec_error=0.03, parallax_error=0.05,
            pmra_error=0.03, pmdec_error=0.03,
        )

    hip = HipparcosIADObs(
        iad_file=write_synth_iad(os.path.join(tmpdir, "iad.d"), res_sigma=1.5)
    )
    scanlaw = (REAL_GOST if os.path.exists(REAL_GOST)
               else synth_gost_dr23(tmpdir))
    gaia = GaiaCatalogFitObs(gaia_sol=gaia_sol, scanlaw=scanlaw)
    g23h = G23HObs(catalog=row, gaia_like=gaia, hip_like=hip)

    plx0 = gaia_sol["parallax"]
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.LogUniform(0.1, 50.0), e=0.05, i=dist.Sine(),
            omega=oc.UniformCircular(), Omega=oc.UniformCircular(),
            tp=dist.Uniform(40000.0, 60000.0),
            mass=dist.LogUniform(1.0, 3000.0),  # Mjup: planet..M-dwarf
        ),
    )
    system = oc.System(
        name="G23H_example",
        variables=dict(
            M=dist.truncated(dist.Normal(1.0, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(plx0, 2.0), lower=0.1),
            pmra=dist.Normal(gaia_sol["pmra"], 20.0),
            pmdec=dist.Normal(gaia_sol["pmdec"], 20.0),
        ),
        companions=[b], observations=[g23h],
    )
    return oc.LogDensityModel(system, verbosity=1)


def main():
    model = build_model()
    key = jax.random.PRNGKey(0)
    model.initialize(key, verbosity=1)

    chain, pt = oc.octofit_pigeons(
        model, n_chains=8, n_chains_variational=8, n_walkers=16,
        n_rounds=7, explorer="chees", explorer_n_leapfrog=256,
        verbosity=2, key=key,
    )
    print(f"log-evidence {pt['logevidence']:.1f}, "
          f"barriers fixed {pt['global_barrier']:.2f} / "
          f"variational {pt['global_barrier_variational']:.2f}")
    summ = chain.summary()
    for k in ("b_mass", "b_a", "b_i", "plx", "pmra", "pmdec"):
        s = summ[k]
        print(f"{k:8s} {s['mean']:12.4f} +/- {s['std']:.4f}  rhat {s['rhat']:.3f}")

    oc.plots.masspostplot(model, chain, fname="g23h_mass.png")
    oc.octocorner(model, chain, small=True, fname="g23h_corner.png")
    print("wrote g23h_mass.png, g23h_corner.png")


if __name__ == "__main__":
    main()
