"""Direct images, interferometric closure phases (OIFITS), and transits.

Mirrors the reference tutorials `docs/src/images.md`,
`docs/src/fit-interfere.md`, and `docs/src/fit-transit.md`: three
independent fits showing each data modality's observation object.

Run: python examples/05_images_interferometry_transits.py
"""

import os
import tempfile
import time
_t0 = time.time()

def _tick(msg):
    print(f"  [{time.time()-_t0:6.1f}s] {msg}", flush=True)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import octofitter_tpu as oc  # noqa: E402
from octofitter_tpu import distributions as dist  # noqa: E402
from octofitter_tpu.images import ImageObs  # noqa: E402
from octofitter_tpu.interferometry import InterferometryObs  # noqa: E402
from octofitter_tpu.io.fits import write_bintables  # noqa: E402
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff  # noqa: E402
from octofitter_tpu.transits import LightCurveObs  # noqa: E402

rng = np.random.default_rng(0)

# =========================================================================
# 1. Direct image: a point source injected into a noise map
# =========================================================================
print("== direct images (docs/src/images.md) ==", flush=True)
_tick("start")
true = dict(a=12.0, e=0.1, i=0.5, omega=1.0, Omega=2.0, tp=57000.0, M=1.2, plx=30.0)
epoch_img = 57400.0
sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray([epoch_img]))
ra_true, dec_true = float(raoff(sol)[0]), float(decoff(sol)[0])

platescale = 10.0  # mas/px
npix = 101
img = rng.standard_normal((npix, npix)) * 0.1
ix = int(round(dec_true / platescale)) + npix // 2
iy = int(round(ra_true / platescale)) + npix // 2
img[ix - 1 : ix + 2, iy - 1 : iy + 2] += 3.0  # bright blob

images = ImageObs(
    [dict(image=img, epoch=epoch_img, platescale=platescale)],
    variables=dict(flux=dist.Uniform(0.0, 10.0)),
    name="nircam",
)
b = oc.Planet(
    name="b", basis="Visual{KepOrbit}",
    variables=dict(
        a=dist.Uniform(5.0, 20.0), e=0.1, i=0.5, omega=1.0, Omega=2.0,
        tp=57000.0,
    ),
    observations=[images],
)
model = oc.LogDensityModel(
    oc.System(name="imgsys", variables=dict(M=1.2, plx=30.0), companions=[b]),
    verbosity=0,
)
chain = oc.octofit(model, chains=16, adaptation=300, iterations=200,
                   max_depth=8, verbosity=0)
s = chain.summary()
print(f"  recovered a = {s['b_a']['mean']:.2f} +- {s['b_a']['std']:.2f} AU "
      f"(true {true['a']})")

# =========================================================================
# 2. Interferometry from an OIFITS file
# =========================================================================
_tick("images done")
print("== interferometry from OIFITS (docs/src/fit-interfere.md) ==", flush=True)
d = tempfile.mkdtemp()
oifits_path = os.path.join(d, "gravity.oifits")
eff_wave = np.linspace(2.0e-6, 2.4e-6, 5)
sta_vis2 = np.array([[1, 2], [1, 3], [2, 3]])
ucoord = np.array([40.0, -25.0, 65.0])
vcoord = np.array([15.0, 80.0, -35.0])

# simulate closure phases of a faint companion at the true position
epoch_if = 57500.0
sol_if = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray([epoch_if]))
dra, ddec = float(raoff(sol_if)[0]), float(decoff(sol_if)[0])
from octofitter_tpu.interferometry import closure_phases_deg, cvis_point_sources

u = ucoord[:, None] / eff_wave[None, :]
v = vcoord[:, None] / eff_wave[None, :]
cvis = cvis_point_sources(jnp.asarray(u), jnp.asarray(v), [jnp.asarray(dra)],
                          [jnp.asarray(ddec)], [jnp.asarray(0.02)])
cp_true = np.asarray(closure_phases_deg(cvis, [0], [2], [1]))
write_bintables(oifits_path, [
    ({"EFF_WAVE": eff_wave}, {"EXTNAME": "OI_WAVELENGTH"}),
    ({"UCOORD": ucoord, "VCOORD": vcoord,
      "VIS2DATA": np.abs(np.asarray(cvis))**2, "VIS2ERR": np.full((3, 5), 0.02),
      "STA_INDEX": sta_vis2, "MJD": np.full(3, epoch_if)},
     {"EXTNAME": "OI_VIS2"}),
    ({"T3PHI": cp_true + rng.standard_normal(cp_true.shape) * 0.5,
      "T3PHIERR": np.full(cp_true.shape, 0.5),
      "STA_INDEX": np.array([[1, 2, 3]]), "MJD": np.full(1, epoch_if)},
     {"EXTNAME": "OI_T3"}),
])

vlti = InterferometryObs(
    [dict(filename=oifits_path, use_vis2=False)],
    variables=dict(f=dist.LogUniform(1e-3, 1e-1),
                   flux=lambda s, p, o: jnp.asarray([o["f"]])),
    name="gravity",
)
b2 = oc.Planet(
    name="b", basis="Visual{KepOrbit}",
    variables=dict(a=dist.Uniform(5.0, 20.0), e=0.1, i=0.5, omega=1.0,
                   Omega=2.0, tp=57000.0),
    observations=[vlti],
)
model2 = oc.LogDensityModel(
    oc.System(name="ifsys", variables=dict(M=1.2, plx=30.0), companions=[b2]),
    verbosity=0,
)
chain2 = oc.octofit(model2, chains=16, adaptation=300, iterations=200,
                    max_depth=8, verbosity=0)
s2 = chain2.summary()
print(f"  recovered a = {s2['b_a']['mean']:.2f} +- {s2['b_a']['std']:.2f} AU, "
      f"contrast = {s2['b_gravity_f']['mean']:.4f} (true 0.02)")

# =========================================================================
# 3. Transit light curve with quadratic limb darkening
# =========================================================================
_tick("interferometry done")
print("== transit photometry (docs/src/fit-transit.md) ==", flush=True)
P_days = 3.5
a_au = (P_days / 365.25) ** (2 / 3) * 1.0 ** (1 / 3)
tp0 = 57000.0
# mid-transit (inferior conjunction) is ~0.932 d before periastron for
# this geometry (omega=0, Omega=0, i=90 deg)
t_mid = tp0 - 0.932
epochs_lc = np.linspace(t_mid - 0.15, t_mid + 0.15, 120)
# inject a transit of radius ratio 0.1 through the generative path
lc0 = LightCurveObs(
    dict(epoch=epochs_lc, phot=np.ones(120), σ_phot=np.full(120, 3e-4)),
    name="tess",
)
R_sun_m = 6.957e8


def transit_system(lc_obs, r_var):
    b3 = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(
            a=a_au, e=0.0, i=np.pi / 2, omega=0.0, Omega=0.0, tp=tp0,
            r=r_var,
        ),
        observations=[lc_obs],
    )
    return oc.System(
        name="transitsys",
        variables=dict(M=1.0, plx=100.0, R=R_sun_m, u1=0.4, u2=0.25),
        companions=[b3],
    )


# generate the observed light curve at the injected radius ratio
from octofitter_tpu.model.generate import generate_from_params  # noqa: E402

# one free parameter: a light initialization is plenty (the defaults
# are sized for multimodal RV/astrometry posteriors)
oc.set_config(init_multistart=64, init_opt_steps=300)

gen_model = oc.LogDensityModel(
    transit_system(lc0, dist.Uniform(0.0, 0.3)), verbosity=0
)
names = gen_model.parameter_names
true_flat = jnp.asarray([0.1 if n == "b_r" else 0.0 for n in names])
sys_obs = generate_from_params(
    gen_model, gen_model.arr2nt(true_flat), add_noise=True,
    rng=np.random.default_rng(1),
)
model3 = oc.LogDensityModel(sys_obs, verbosity=0)
theta_t = model3.link(model3.sample_priors(jax.random.PRNGKey(0)))
print(f"  transit model ln_post at a prior draw: {float(model3.ln_post(theta_t)):.1f}")
chain3 = oc.octofit(model3, chains=8, adaptation=250, iterations=150,
                    max_depth=8, verbosity=0)
s3 = chain3.summary()
print(f"  radius-ratio posterior: {s3['b_r']['mean']:.3f} "
      f"+- {s3['b_r']['std']:.3f} (injected 0.1)")
_tick("transits done")
print("done.")
