"""Real HTTP LLM client for the NL→SQL copilot (the reference's Ollama hop).

The reference calls a local Ollama server for SQL generation
(``ai/rag_api/app.py:126-151``: POST ``{base_url}/api/generate`` with
``{"model": ..., "prompt": ..., "stream": false}``, read the ``response``
field). This module implements that hop as a real HTTP client on the
stdlib only (urllib — no extra deps), shaped as a ``SqlTranslator`` so it
drops into ``guardrails.ask`` unchanged; every byte the model returns
still passes through the fence-extraction → SELECT-only → LIMIT-wrap
guard chain before touching the engine.

Sandbox note: this environment has no external network, so the test
suite exercises the client against a loopback stub server
(tests/test_copilot_http.py) — real sockets, real HTTP framing, real
timeout/retry behavior; only the model behind the endpoint is fake. The
client itself is production-shaped: bounded timeouts, capped retries
with linear backoff on 5xx/connection errors, no retry on 4xx.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field

from f1_lakehouse_spark.copilot.guardrails import GuardrailError

DEFAULT_PROMPT = (
    "You translate analytics questions into a single read-only SQL SELECT "
    "statement for Spark SQL. Use only the tables and columns described "
    "below. Reply with the SQL inside a ```sql fence and nothing else.\n\n"
    "Schema:\n{schema_doc}\n\nQuestion: {question}\n"
)


class LlmHttpError(GuardrailError):
    """The LLM endpoint failed (after retries) or returned a bad body."""


@dataclass
class OllamaTranslator:
    """SqlTranslator backed by an Ollama-compatible ``/api/generate``.

    Reference parity (``ai/rag_api/app.py:126-151``): same endpoint,
    same non-streaming request body, same ``response`` field read. The
    guard chain downstream is unchanged — this class only performs the
    network hop.
    """

    base_url: str = "http://localhost:11434"
    model: str = "llama3"
    timeout_s: float = 30.0
    max_retries: int = 2  # retries AFTER the first attempt, 5xx/conn only
    backoff_s: float = 0.5
    prompt_template: str = DEFAULT_PROMPT
    # options forwarded verbatim (temperature etc.); deterministic default
    options: dict = field(default_factory=lambda: {"temperature": 0})

    def __call__(self, question: str, schema_doc: str) -> str:
        prompt = self.prompt_template.format(
            question=question, schema_doc=schema_doc
        )
        body = json.dumps(
            {
                "model": self.model,
                "prompt": prompt,
                "stream": False,
                "options": self.options,
            }
        ).encode("utf-8")
        url = f"{self.base_url.rstrip('/')}/api/generate"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                req = urllib.request.Request(
                    url, data=body, headers={"Content-Type": "application/json"}
                )
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    payload = resp.read()
                break
            except urllib.error.HTTPError as err:
                # 4xx is a caller bug (bad model name, bad body): no retry
                if 400 <= err.code < 500:
                    raise LlmHttpError(
                        f"LLM endpoint rejected request: HTTP {err.code}"
                    ) from err
                last_err = err
            except (urllib.error.URLError, TimeoutError, OSError) as err:
                last_err = err
            if attempt < self.max_retries:
                time.sleep(self.backoff_s * (attempt + 1))
        else:
            raise LlmHttpError(
                f"LLM endpoint unreachable after {self.max_retries + 1} "
                f"attempts: {last_err}"
            ) from last_err
        try:
            doc = json.loads(payload.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as err:
            raise LlmHttpError("LLM endpoint returned non-JSON body") from err
        if "response" not in doc:
            raise LlmHttpError(
                "LLM endpoint JSON is missing the 'response' field"
            )
        return str(doc["response"])
