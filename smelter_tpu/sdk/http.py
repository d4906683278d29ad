"""HTTP API client (the side-channel consumers' control path).

Thin typed wrapper over the wire API — the same requests a reference client
sends (`src/routes.rs:33-79`), so it works against either server.
"""

from __future__ import annotations

from typing import Optional

import httpx


def _schedule_body(schedule_time_ms: Optional[float]) -> dict:
    """Unregister routes accept an optional deferred-action time
    (unregister_request.rs schedule_time_ms)."""
    return ({} if schedule_time_ms is None
            else {"schedule_time_ms": schedule_time_ms})


class SmelterApiError(RuntimeError):
    def __init__(self, status: int, body: dict) -> None:
        super().__init__(f"{status}: {body.get('message', body)}")
        self.status = status
        self.error_code = body.get("error_code")
        self.body = body


class SmelterClient:
    def __init__(self, base_url: str = "http://127.0.0.1:8081",
                 timeout: float = 60.0) -> None:
        self._client = httpx.Client(base_url=base_url, timeout=timeout)

    def _post(self, path: str, body: Optional[dict] = None) -> dict:
        r = self._client.post(path, json=body or {})
        payload = r.json() if r.content else {}
        if r.status_code != 200:
            raise SmelterApiError(r.status_code, payload)
        return payload

    # -- inputs / outputs -----------------------------------------------------

    def register_input(self, input_id: str, spec: dict) -> dict:
        return self._post(f"/api/input/{input_id}/register", spec)

    def unregister_input(self, input_id: str,
                         schedule_time_ms: Optional[float] = None) -> dict:
        return self._post(f"/api/input/{input_id}/unregister",
                          _schedule_body(schedule_time_ms))

    def register_output(self, output_id: str, spec: dict) -> dict:
        return self._post(f"/api/output/{output_id}/register", spec)

    def unregister_output(self, output_id: str,
                          schedule_time_ms: Optional[float] = None) -> dict:
        return self._post(f"/api/output/{output_id}/unregister",
                          _schedule_body(schedule_time_ms))

    def update_output(self, output_id: str, video: Optional[dict] = None,
                      audio: Optional[dict] = None,
                      schedule_time_ms: Optional[float] = None) -> dict:
        body: dict = {}
        if video is not None:
            body["video"] = video
        if audio is not None:
            body["audio"] = audio
        if schedule_time_ms is not None:
            body["schedule_time_ms"] = schedule_time_ms
        return self._post(f"/api/output/{output_id}/update", body)

    def request_keyframe(self, output_id: str) -> dict:
        return self._post(f"/api/output/{output_id}/request_keyframe")

    # -- resources -------------------------------------------------------------

    def register_shader(self, shader_id: str, source: str) -> dict:
        return self._post(f"/api/shader/{shader_id}/register", {"source": source})

    def unregister_shader(self, shader_id: str,
                          schedule_time_ms: Optional[float] = None) -> dict:
        return self._post(f"/api/shader/{shader_id}/unregister",
                          _schedule_body(schedule_time_ms))

    def register_image(self, image_id: str, **spec) -> dict:
        return self._post(f"/api/image/{image_id}/register", spec)

    def unregister_image(self, image_id: str,
                         schedule_time_ms: Optional[float] = None) -> dict:
        return self._post(f"/api/image/{image_id}/unregister",
                          _schedule_body(schedule_time_ms))

    def register_font(self, path: Optional[str] = None, url: Optional[str] = None) -> dict:
        return self._post("/api/font/register", {"path": path, "url": url})

    # -- control / observability -------------------------------------------------

    def start(self) -> dict:
        return self._post("/api/start")

    def reset(self) -> dict:
        return self._post("/api/reset")

    def status(self) -> dict:
        r = self._client.get("/status")
        return r.json()

    def stats(self) -> dict:
        r = self._client.get("/stats")
        return r.json()

    def close(self) -> None:
        self._client.close()

    def __enter__(self) -> "SmelterClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
