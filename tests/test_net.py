"""Live data-acquisition layer (octofitter_tpu/net.py) driven end-to-end
against a local HTTP fixture server.

The reference's L9 layer talks to ESA web services at runtime: Gaia TAP
(`src/likelihoods/gaia-utils.jl:183-288`), the GOST scanning-law
forecast tool (`gaia-utils.jl:709-831`), and the NSS TAP table
(`src/nss.jl:29-93`). This environment has zero egress, so these tests
stand up a real `http.server` implementing the same protocols (session
cookie + form POST + CSV export for GOST; ADQL query params for TAP)
and drive the full request/cache path through it.
"""

import http.server
import os
import threading
import urllib.parse
import urllib.error

import numpy as np
import pytest

from octofitter_tpu import net

REF_GOST = (
    "/root/reference/docs/src/"
    "GOST-158.30707896392835-40.42555422701387-dr3.csv"
)

GAIA_CSV = (
    "source_id,ra,dec,parallax,pmra,pmdec,phot_g_mean_mag,designation\n"
    "12345,158.307,40.4255,24.5,-51.2,12.25,7.9,Gaia DR3 12345\n"
)
NSS_CSV = (
    "source_id,nss_solution_type,period,eccentricity,t_periastron\n"
    "67890,Orbital,1012.5,0.31,-120.25\n"
)


def _gost_fixture_bytes(n_rows=24):
    with open(REF_GOST, "rb") as f:
        lines = f.read().splitlines(keepends=True)
    return b"".join(lines[: n_rows + 1])


class _FixtureHandler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def _send(self, body, ctype="text/plain", headers=()):
        if isinstance(body, str):
            body = body.encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in headers:
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(parsed.query)
        self.server.calls.append(("GET", parsed.path, qs))
        if parsed.path == "/tap/sync":
            # protocol shape from gaia-utils.jl:187-196
            assert qs["REQUEST"] == ["doQuery"]
            assert qs["LANG"] == ["ADQL"]
            assert qs["FORMAT"] == ["CSV"]
            query = qs["QUERY"][0]
            if "nss_two_body_orbit" in query:
                assert "67890" in query
                self._send(NSS_CSV, "text/csv")
            else:
                assert "gaia_source" in query and "12345" in query
                self._send(GAIA_CSV, "text/csv")
        elif parsed.path == "/gost/":
            # landing page opens the session (JSESSIONID cookie)
            self._send(
                "<html>GOST</html>", "text/html",
                headers=[("Set-Cookie", "JSESSIONID=FIXTURESESSION; Path=/")],
            )
        elif parsed.path.startswith("/files/"):
            # static archive payloads for the datadeps fetch tests
            name = parsed.path[len("/files/"):]
            body = self.server.files.get(name)
            if body is None:
                self.send_error(404)
            else:
                self._send(body, "application/octet-stream")
        elif parsed.path == "/gost/export.jsp":
            # export requires {session}/{job} and the session cookie
            assert qs["id"] == ["FIXTURESESSION/4242"]
            assert qs["format"] == ["csv"]
            assert "JSESSIONID=FIXTURESESSION" in self.headers.get("Cookie", "")
            self._send(_gost_fixture_bytes(), "text/csv")
        else:
            self.send_error(404)

    def do_POST(self):
        parsed = urllib.parse.urlparse(self.path)
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        form = urllib.parse.parse_qs(body.decode("utf-8"))
        self.server.calls.append(("POST", parsed.path, form))
        if parsed.path == "/gost/GostServlet":
            # the submission must ride the session opened by the GET
            assert "JSESSIONID=FIXTURESESSION" in self.headers.get("Cookie", "")
            assert form["inputmode"] == ["single"]
            assert "srcra" in form and "srcdec" in form
            assert form["from"] == [net.GOST_FROM]
            assert form["to"] == [net.GOST_TO["dr3"]]
            self._send(
                "<html>Submitted with id 4242</html>", "text/html"
            )
        else:
            self.send_error(404)


@pytest.fixture()
def fixture_server():
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _FixtureHandler)
    server.calls = []
    server.files = {}
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        yield base, server
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_parse_tap_csv_row():
    row = net.parse_tap_csv_row(GAIA_CSV)
    assert row["source_id"] == 12345.0
    assert row["parallax"] == pytest.approx(24.5)
    assert row["designation"] == "Gaia DR3 12345"  # non-float stays str
    with pytest.raises(KeyError):
        net.parse_tap_csv_row("source_id,ra\n")  # header only


def test_gaia_catalog_query_and_cache(fixture_server, tmp_path):
    base, server = fixture_server
    url = base + "/tap/sync"
    row = net.query_gaia_catalog(12345, "dr3", cache_dir=str(tmp_path), url=url)
    assert row["parallax"] == pytest.approx(24.5)
    assert row["pmra"] == pytest.approx(-51.2)
    # cached in the reference's file layout (gaia-utils.jl:198-207)
    cache = tmp_path / "_gaia_dr3" / "source-12345.csv"
    assert cache.is_file()
    n_http = len(server.calls)
    # second call must not touch the network
    row2 = net.query_gaia_catalog(
        12345, "dr3", cache_dir=str(tmp_path), url="http://0.0.0.0:1/dead"
    )
    assert row2 == row
    assert len(server.calls) == n_http
    with pytest.raises(ValueError):
        net.query_gaia_catalog(12345, "dr9", cache_dir=str(tmp_path), url=url)


def test_nss_tap_query_and_cache(fixture_server, tmp_path):
    base, server = fixture_server
    url = base + "/tap/sync"
    row = net.query_nss_tap(67890, url=url, cache_dir=str(tmp_path))
    assert row["nss_solution_type"] == "Orbital"
    assert row["period"] == pytest.approx(1012.5)
    assert (tmp_path / "_gaia_nss" / "source-67890.csv").is_file()
    n_http = len(server.calls)
    row2 = net.query_nss_tap(
        67890, url="http://0.0.0.0:1/dead", cache_dir=str(tmp_path)
    )
    assert row2 == row
    assert len(server.calls) == n_http


def test_query_nss_uses_live_path(fixture_server, tmp_path, monkeypatch):
    """`query_nss(gaia_id=...)` with no row/cache goes through the TAP
    layer (reference `nss.jl:29-93` behavior)."""
    from octofitter_tpu.nss import query_nss

    base, _ = fixture_server
    monkeypatch.setattr(net, "GAIA_TAP_URL", base + "/tap/sync")
    monkeypatch.setenv("OCTOFITTER_DATA_DIR", str(tmp_path))
    row = query_nss(67890)
    assert row["eccentricity"] == pytest.approx(0.31)
    with pytest.raises(RuntimeError):
        query_nss()


def test_gost_forecast_live_protocol_and_cache(fixture_server, tmp_path):
    base, server = fixture_server
    ra, dec = 158.30707896392835, 40.42555422701387
    table = net.GOST_forecast(
        ra, dec, baseline="dr3", cache_dir=str(tmp_path),
        base_url=base + "/gost/",
    )
    # the full session flow ran: landing GET, servlet POST, export GET
    paths = [(m, p) for m, p, _ in server.calls]
    assert ("GET", "/gost/") in paths
    assert ("POST", "/gost/GostServlet") in paths
    assert ("GET", "/gost/export.jsp") in paths
    # parsed into the standard scan-table contract, time-sorted
    assert set(table) >= {
        "epoch", "scanAngle_rad", "cosphi", "sinphi",
        "parallaxFactorAlongScan",
    }
    assert np.all(np.diff(table["epoch"]) >= 0)
    assert len(table["epoch"]) == 24
    # cached under the reference's file name (gaia-utils.jl:739-744)
    cache = tmp_path / f"GOST-{ra}-{dec}-dr3.csv"
    assert cache.is_file()
    n_http = len(server.calls)
    table2 = net.GOST_forecast(
        ra, dec, baseline="dr3", cache_dir=str(tmp_path),
        base_url="http://0.0.0.0:1/dead/",
    )
    np.testing.assert_array_equal(table2["epoch"], table["epoch"])
    assert len(server.calls) == n_http
    with pytest.raises(ValueError):
        net.GOST_forecast(ra, dec, baseline="dr99", cache_dir=str(tmp_path))


def test_gost_forecast_matches_direct_csv_load(fixture_server, tmp_path):
    from octofitter_tpu.astrom.scanlaw import load_gost_csv

    base, _ = fixture_server
    table = net.GOST_forecast(
        1.0, 2.0, baseline="dr3", cache_dir=str(tmp_path),
        base_url=base + "/gost/",
    )
    direct = load_gost_csv(REF_GOST)
    np.testing.assert_allclose(
        table["parallaxFactorAlongScan"],
        direct["parallaxFactorAlongScan"][: len(table["epoch"])],
    )


def test_gost_catalog_lookup(tmp_path, monkeypatch):
    """OCTO_GOST_CATALOG bulk-database path (gaia-utils.jl:717-737):
    nearest-target row selection with a 500 mas match radius."""
    import pandas as pd

    ra1, dec1 = 2.762979757764773, 0.7055590227334224
    ra2, dec2 = 1.0, -0.5
    tcb0 = 2456950.0
    rows = []
    for k in range(6):
        tgt, ra, dec = ("A", ra1, dec1) if k < 3 else ("B", ra2, dec2)
        rows.append({
            "Target": tgt, "ra[rad]": ra, "dec[rad]": dec,
            "ObservationTimeAtGaia[UTC]": "2014-10-19T22:30:37.955",
            "scanAngle[rad]": 0.1 * k,
            "parallaxFactorAlongScan": -0.5 + 0.1 * k,
            "parallaxFactorAcrossScan": 0.7,
            "ObservationTimeAtBarycentre[BarycentricJulianDateInTCB]":
                tcb0 + 10.0 * k,
        })
    cat = tmp_path / "gost_catalog.csv"
    pd.DataFrame(rows).to_csv(cat, index=False)

    from octofitter_tpu.config import get_config

    monkeypatch.setattr(get_config(), "gost_catalog", str(cat))
    table = net.GOST_forecast(np.rad2deg(ra1), np.rad2deg(dec1))
    assert len(table["epoch"]) == 3
    np.testing.assert_allclose(
        table["parallaxFactorAlongScan"], [-0.5, -0.4, -0.3]
    )
    # a position far from every catalog target must error, not
    # silently return the wrong star
    with pytest.raises(KeyError):
        net.GOST_forecast(90.0, -45.0)


def test_dedup_scan_table():
    t = {
        "epoch": np.array([100.0, 100.0 + 2e-5, 101.0, 102.0]),
        "parallaxFactorAlongScan": np.array([1.0, 2.0, 3.0, 4.0]),
    }
    out = net._dedup_scan_table(t)
    np.testing.assert_array_equal(out["epoch"], [100.0, 101.0, 102.0])
    np.testing.assert_array_equal(
        out["parallaxFactorAlongScan"], [1.0, 3.0, 4.0]
    )
    # already-clean tables come back unchanged (same object)
    assert net._dedup_scan_table(out) is out


def test_gost_submission_error_detected(fixture_server, tmp_path):
    """A servlet response without a job id must raise, not cache junk."""
    base, server = fixture_server

    class _BadServlet(_FixtureHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            self._send("<html>error: rate limited</html>", "text/html")

    bad = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _BadServlet)
    bad.calls = []
    th = threading.Thread(target=bad.serve_forever, daemon=True)
    th.start()
    try:
        with pytest.raises(IOError):
            net.GOST_forecast(
                10.0, 20.0, baseline="dr3", cache_dir=str(tmp_path),
                base_url=f"http://127.0.0.1:{bad.server_address[1]}/gost/",
            )
        assert not (tmp_path / "GOST-10.0-20.0-dr3.csv").exists()
    finally:
        bad.shutdown()
        th.join(timeout=5)


def test_datadeps_fetch_unpack_resolve(fixture_server, tmp_path, monkeypatch):
    """The archive download path end-to-end over real HTTP: DataDeps
    registration -> fetch -> sha256 verify -> post-fetch unpack ->
    resolve, mirroring the reference's Sonora tarball registration
    (`src/Octofitter.jl:166-343` `post_fetch_method=unpack`)."""
    import hashlib
    import io
    import tarfile

    from octofitter_tpu import datadeps

    base, server = fixture_server
    monkeypatch.setenv("OCTOFITTER_DATA_DIR", str(tmp_path))

    # a tiny Sonora-shaped tarball: photometry_tables/ directory with a
    # flux table inside (the registered resolve target)
    payload = b"Teff  logg  M_J\n500  4.5  12.3\n"
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        info = tarfile.TarInfo("photometry_tables/sonora_flux_table.txt")
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    archive = buf.getvalue()
    server.files["sonora_bobcat.tar.gz"] = archive
    url = base + "/files/sonora_bobcat.tar.gz"

    # wrong checksum must not leave anything staged
    with pytest.raises(IOError):
        datadeps.fetch_dataset("Sonora_Bobcat", url=url, sha256="0" * 64)
    with pytest.raises(FileNotFoundError):
        datadeps.resolve_dataset("Sonora_Bobcat")

    path = datadeps.fetch_dataset(
        "Sonora_Bobcat", url=url,
        sha256=hashlib.sha256(archive).hexdigest(), unpack=True,
    )
    # the archive was extracted and deleted; resolution lands on the
    # photometry_tables payload directory
    assert os.path.basename(path) == "photometry_tables"
    assert not (tmp_path / "sonora_bobcat.tar.gz").exists()
    table = tmp_path / "photometry_tables" / "sonora_flux_table.txt"
    assert table.read_bytes() == payload
    assert datadeps.resolve_dataset("Sonora_Bobcat") == str(path)

    # second fetch is a cache hit: no HTTP traffic
    n_http = len(server.calls)
    again = datadeps.fetch_dataset(
        "Sonora_Bobcat", url="http://0.0.0.0:1/dead", unpack=True
    )
    assert again == path
    assert len(server.calls) == n_http


def test_datadeps_fetch_plain_file(fixture_server, tmp_path, monkeypatch):
    """Non-archive registrations (HGCA FITS-style) fetch to the
    registered filename with no unpack step."""
    from octofitter_tpu import datadeps

    base, server = fixture_server
    monkeypatch.setenv("OCTOFITTER_DATA_DIR", str(tmp_path))
    server.files["hgca.fits"] = b"SIMPLE  =                    T fake"
    path = datadeps.fetch_dataset("HGCA_eDR3", url=base + "/files/hgca.fits")
    assert path == str(tmp_path / "HGCA_vEDR3.fits")
    assert open(path, "rb").read().startswith(b"SIMPLE")
