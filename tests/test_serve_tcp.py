"""TCP NDJSON front-end tests (SURVEY.md SS3.5 serve mode).

Covers the frame decode / submit / error path of runtime.serving.serve_tcp:
concurrent clients on one server, a malformed-b64 frame, a wrong-shape frame
(parsed JSON — the error response must echo the request id), and raw garbage
(unparseable JSON — id falls back to null). The server must survive all of it.
"""

import asyncio
import base64
import json

import numpy as np
import pytest

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.runtime.pipeline import InferencePipeline
from mobilenet_tpu.runtime.serving import MicroBatchServer, make_tcp_server

RES = 128


@pytest.fixture(scope="module")
def pipe():
    return InferencePipeline(ModelConfig(alpha=0.25, resolution=RES), seed=0)


def _frame(rid, img: np.ndarray) -> bytes:
    return (json.dumps({
        "id": rid,
        "shape": list(img.shape),
        "image_b64": base64.b64encode(img.tobytes()).decode(),
    }) + "\n").encode()


async def _roundtrip(port, payloads):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    out = []
    for p in payloads:
        writer.write(p)
        await writer.drain()
        out.append(json.loads(await reader.readline()))
    writer.close()
    return out


def test_tcp_concurrent_clients_and_malformed_frames(pipe):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (RES, RES, 3), dtype=np.uint8)

    async def run():
        server = MicroBatchServer(pipe, max_batch=8, max_delay_ms=2.0)
        await server.start()
        tcp = await make_tcp_server(server, "127.0.0.1", 0)
        port = tcp.sockets[0].getsockname()[1]

        # 3 concurrent well-formed clients, 2 requests each.
        good = [
            _roundtrip(port, [_frame(f"c{c}r{r}", img) for r in range(2)])
            for c in range(3)
        ]
        good_resps = await asyncio.gather(*good)

        # One client sends malformed frames, then a good one: the connection
        # and the server must survive, and parsed-JSON errors echo the id.
        bad_b64 = (json.dumps({
            "id": "bad-b64", "shape": [RES, RES, 3], "image_b64": "!!!",
        }) + "\n").encode()
        wrong_shape = _frame(
            "wrong-shape", rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
        garbage = b"this is not json\n"
        mixed = await _roundtrip(
            port, [bad_b64, wrong_shape, garbage, _frame("ok-after", img)])

        tcp.close()
        await tcp.wait_closed()
        await server.close()
        return good_resps, mixed

    good_resps, mixed = asyncio.run(run())

    for c, resps in enumerate(good_resps):
        for r, resp in enumerate(resps):
            assert resp["id"] == f"c{c}r{r}"
            assert len(resp["top"]) == 5
            assert all(0 <= cls < 1000 for cls, _ in resp["top"])

    assert mixed[0]["id"] == "bad-b64" and "error" in mixed[0]
    assert mixed[1]["id"] == "wrong-shape" and "error" in mixed[1]
    assert mixed[2]["id"] is None and "error" in mixed[2]
    assert mixed[3]["id"] == "ok-after" and len(mixed[3]["top"]) == 5


def test_tcp_int8_pipeline_roundtrip():
    """The TCP front end serves the INT8 fixed-point pipeline too (the
    reference served its quantized path multi-stream — SURVEY.md SS2 C7/C12):
    a valid frame returns top-k probs, and the result matches the pipeline's
    direct run_batch output."""
    from mobilenet_tpu.quant.model import Int8Pipeline

    qpipe = Int8Pipeline(ModelConfig(alpha=0.25, resolution=RES), seed=0)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (RES, RES, 3), dtype=np.uint8)
    direct = qpipe.run_batch(img[None])[0]

    async def run():
        server = MicroBatchServer(qpipe, max_batch=4, max_delay_ms=5)
        await server.start()
        srv = await make_tcp_server(server, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        async with srv:
            (resp,) = await _roundtrip(port, [_frame("q1", img)])
        await server.close()
        return resp

    resp = asyncio.run(run())
    assert resp["id"] == "q1" and "error" not in resp
    top_cls, top_p = resp["top"][0]
    assert top_cls == int(np.argmax(direct))
    np.testing.assert_allclose(top_p, float(direct.max()), rtol=1e-5)
