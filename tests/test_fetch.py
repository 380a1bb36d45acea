"""Distributed HTTP-JSON ingest (data_fetcher / get_ids analog) against a
loopback endpoint implementing the Mongo-style $in query of the reference
API (fetcher_pymatgen.py:22-105)."""

import http.server
import json
import threading

import numpy as np
import pytest

from featurebox_ray.sources.fetch import (JsonApiFetcher, data_fetcher,
                                          fetch_records, get_ids)

# fixture corpus: two records carry a nested elasticity dict
RECORDS = {
    f"mp-{i}": {
        "material_id": f"mp-{i}",
        "band_gap": 0.1 * i,
        "density": 5.0 + i,
        "volume": 30.0 + i,
        "pretty_formula": f"X{i}Y",
        "elements": ["X", "Y"],
        "efermi": 1.0 + 0.5 * i,
        "e_above_hull": 0.0,
        "formation_energy_per_atom": -1.0 - i,
        "final_energy_per_atom": -2.0 - i,
        "unit_cell_formula": {"X": i, "Y": 1},
        "spacegroup": {"symbol": "Fm-3m", "number": 225},
        "nelements": 2,
        **({"elasticity": {"K_VRH": 100.0 + i, "G_VRH": 50.0 + i}}
           if i % 3 == 0 else {}),
    }
    for i in range(25)
}


class _ApiHandler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        crit = body["criteria"]
        props = body["properties"]
        out = []
        for rec in RECORDS.values():
            ok = True
            for field, cond in crit.items():
                val = rec.get(field)
                if isinstance(cond, dict):
                    if "$in" in cond and val not in cond["$in"]:
                        ok = False
                    if "$gte" in cond and not (val is not None
                                               and val >= cond["$gte"]):
                        ok = False
                elif val != cond:
                    ok = False
            if ok:
                out.append({p: rec[p] for p in props if p in rec})
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def endpoint():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/query"
    srv.shutdown()


def test_fetch_records_dataset(ray_session, endpoint):
    ids = [f"mp-{i}" for i in range(25)] + ["mp-999"]  # one unknown id
    ds = fetch_records(endpoint, ids, chunk_size=4, rows_per_task=7,
                       flatten="elasticity", flatten_keys=["K_VRH", "G_VRH"])
    df = ds.to_pandas().sort_values("material_id").set_index("material_id")
    assert len(df) == 25  # unknown id yields no record
    assert df.loc["mp-3", "K_VRH"] == 103.0
    assert np.isnan(df.loc["mp-1", "K_VRH"])  # no elasticity record
    assert df.loc["mp-7", "band_gap"] == pytest.approx(0.7)
    # nested props ride as JSON text with deterministic key order
    assert json.loads(df.loc["mp-2", "spacegroup"])["number"] == 225


def test_fetcher_schema_stable_across_batches(endpoint):
    import pyarrow as pa

    f = JsonApiFetcher(endpoint, id_field="material_id", chunk_size=3,
                       flatten="elasticity", flatten_keys=["K_VRH"])
    # batch of only elasticity-less ids vs a mixed batch: identical schema
    t1 = f(pa.table({"material_id": ["mp-1", "mp-2"]}))
    t2 = f(pa.table({"material_id": ["mp-3", "mp-4"]}))
    assert t1.schema == t2.schema


def test_data_fetcher_frame_shape(ray_session, endpoint):
    df = data_fetcher(endpoint, [f"mp-{i}" for i in range(6)])
    # reference shape: transposed, properties as rows, ids as columns
    assert "mp-3" in df.columns and "composition" in df.index
    assert df.loc["composition", "mp-2"] == {"X": 2, "Y": 1}
    assert df.loc["K_VRH", "mp-3"] == 103.0  # dynamic flatten at driver
    assert list(df.index) == sorted(df.index)
    assert df.loc["nelements", "mp-5"] == 2


def test_get_ids(endpoint):
    ids = get_ids(endpoint, {"band_gap": {"$gte": 2.0}})
    assert ids == [f"mp-{i}" for i in range(20, 25)]
