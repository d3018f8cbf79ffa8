"""HTTP surface: OpenAI-compatible endpoints over the serving engine.

Stdlib ThreadingHTTPServer (the cpp-httplib analogue, tools/server/
server-http.cpp) — each request thread parses/validates, posts a Task to the
single inference loop, and streams SSE chunks back. Endpoints mirror the
reference's routing table (tools/server/server.cpp:172-218):

  POST /completion /completions /v1/completions   - text completion
  POST /v1/chat/completions                       - chat (template-applied)
  POST /tokenize /detokenize /apply-template
  GET  /health /props /v1/models /metrics (Prometheus) /slots
"""
from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .chat import apply_chat_template
from .context import GenParams, ServerContext, Task


def _gen_params(body: dict) -> GenParams:
    p = GenParams()
    m = {
        "max_tokens": "max_tokens", "n_predict": "max_tokens",
        "temperature": "temperature", "top_k": "top_k", "top_p": "top_p",
        "min_p": "min_p", "typical_p": "typical_p", "top_n_sigma": "top_n_sigma",
        "xtc_probability": "xtc_probability", "xtc_threshold": "xtc_threshold",
        "repeat_penalty": "penalty_repeat", "frequency_penalty": "penalty_freq",
        "presence_penalty": "penalty_present", "seed": "seed",
        "ignore_eos": "ignore_eos", "stream": "stream", "n_probs": "n_probs",
        "mirostat": "mirostat", "mirostat_tau": "mirostat_tau",
        "mirostat_eta": "mirostat_eta", "n_keep": "n_keep",
        "top_logprobs": "n_probs",
        "dry_multiplier": "dry_multiplier", "dry_base": "dry_base",
        "dry_allowed_length": "dry_allowed_length",
    }
    for k, attr in m.items():
        if k in body and body[k] is not None:
            setattr(p, attr, type(getattr(p, attr))(body[k]))
    if body.get("logprobs") is True and p.n_probs == 0:
        p.n_probs = 1
    stop = body.get("stop")
    if isinstance(stop, str):
        p.stop = [stop]
    elif isinstance(stop, list):
        p.stop = [str(s) for s in stop]
    lb = body.get("logit_bias")
    if isinstance(lb, (dict, list)) and lb:
        p.logit_bias = lb
    if body.get("grammar"):
        p.grammar = str(body["grammar"])
    if body.get("grammar_lazy"):
        p.grammar_lazy = bool(body["grammar_lazy"])
    gt = body.get("grammar_triggers")
    if isinstance(gt, list) and gt:
        # reference accepts {type: word|pattern..., value} objects
        # (tools/server/server.cpp params_from_json_cmpl) or raw strings
        pats = []
        import re as _re
        for t in gt:
            if isinstance(t, dict):
                val = str(t.get("value", ""))
                typ = t.get("type", 1)
                # COMMON_GRAMMAR_TRIGGER_TYPE_WORD=1 -> literal word;
                # PATTERN=2 / PATTERN_FULL=3 -> regex as given
                pats.append(_re.escape(val) if typ in (1, "word") else val)
            else:
                pats.append(_re.escape(str(t)))
        p.grammar_triggers = tuple(x for x in pats if x)
    # opt-in infill sampler: "samplers": [..., "infill"] (the reference
    # chain member, common/sampling.cpp:352) or a direct boolean
    samplers = body.get("samplers")
    if (isinstance(samplers, list) and "infill" in samplers) \
            or body.get("infill_sampler"):
        p.infill_sampler = True
    if body.get("json_schema"):
        p.json_schema = body["json_schema"]
    rf = body.get("response_format")
    if isinstance(rf, dict):  # OpenAI structured output
        if rf.get("type") == "json_schema":
            js = rf.get("json_schema", {})
            p.json_schema = js.get("schema", js)
        elif rf.get("type") == "json_object":
            p.json_schema = {}
    return p


class _SlotBusy(Exception):
    pass


class Handler(BaseHTTPRequestHandler):
    ctx: ServerContext = None  # set by serve()
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        pass

    # ------------------------------------------------------------- helpers

    def _json(self, code: int, obj):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _error(self, code: int, msg: str):
        self._json(code, {"error": {"message": msg, "type": "invalid_request_error"}})

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        if n == 0:
            return {}
        return json.loads(self.rfile.read(n))

    def _sse_start(self):
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

    def _sse(self, obj):
        data = b"data: " + json.dumps(obj).encode() + b"\n\n"
        self.wfile.write(hex(len(data))[2:].encode() + b"\r\n" + data + b"\r\n")

    def _sse_done(self):
        data = b"data: [DONE]\n\n"
        self.wfile.write(hex(len(data))[2:].encode() + b"\r\n" + data + b"\r\n")
        self.wfile.write(b"0\r\n\r\n")

    # -------------------------------------------------------------- routes

    def do_GET(self):
        ctx = self.ctx
        path = self.path.split("?")[0]
        if path in ("/", "/index.html"):
            # built-in chat web UI (tools/server/webui analogue)
            from .webui import PAGE

            data = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        elif path == "/health":
            self._json(200, {"status": "ok"})
        elif path == "/v1/models":
            self._json(200, {"object": "list", "data": [{
                "id": ctx.model_name, "object": "model", "created": 0,
                "owned_by": "tpullm"}]})
        elif path == "/props":
            self._json(200, {
                "model": ctx.model_name,
                "n_ctx": ctx.max_seq_len,
                "n_slots": ctx.n_slots,
                "arch": ctx.cfg.arch,
                "vocab_size": ctx.cfg.vocab_size,
            })
        elif path == "/slots":
            self._json(200, [{
                "id": i,
                "busy": r.task is not None,
                "n_past": ctx.memory.slots[i].n_past,
                "n_gen": len(r.gen),
            } for i, r in enumerate(ctx.rt)])
        elif path == "/lora-adapters":
            self._json(200, ctx.lora_list())
        elif path == "/metrics":
            m = ctx.metrics
            lines = []
            for k, v in m.items():
                name = f"tpullm:{k}"
                kind = "counter" if k.endswith("_total") else "gauge"
                lines.append(f"# TYPE {name} {kind}")
                lines.append(f"{name} {v}")
            data = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        else:
            self._error(404, f"unknown path {path}")

    def do_POST(self):
        ctx = self.ctx
        path = self.path.split("?")[0]
        try:
            body = self._body()
        except Exception as e:
            return self._error(400, f"bad json: {e}")
        try:
            if path in ("/completion", "/completions", "/v1/completions"):
                return self._completion(body, chat=False)
            if path == "/v1/chat/completions":
                return self._completion(body, chat=True)
            if path == "/v1/messages":
                return self._anthropic_messages(body)
            if path == "/v1/messages/count_tokens":
                msgs = body.get("messages", [])
                prompt = apply_chat_template(ctx, _anth_to_openai(body, msgs))
                n = len(ctx.tok.encode(prompt, add_special=True, parse_special=True))
                return self._json(200, {"input_tokens": n})
            if path == "/v1/responses":
                return self._openai_responses(body)
            if path == "/tokenize":
                toks = ctx.tok.encode(body.get("content", ""),
                                      add_special=bool(body.get("add_special", False)))
                return self._json(200, {"tokens": toks})
            if path == "/detokenize":
                text = ctx.tok.decode([int(t) for t in body.get("tokens", [])])
                return self._json(200, {"content": text})
            if path == "/apply-template":
                prompt = apply_chat_template(ctx, body.get("messages", []))
                return self._json(200, {"prompt": prompt})
            if path in ("/embedding", "/embeddings", "/v1/embeddings"):
                return self._embeddings(body)
            if path in ("/rerank", "/reranking", "/v1/rerank", "/v1/reranking"):
                return self._rerank(body)
            if path == "/infill":
                return self._infill(body)
            if path.startswith("/slots/"):
                return self._slot_action(path, body)
            if path == "/state":
                return self._state_action(body)
            if path == "/lora-adapters":
                try:
                    return self._json(200, ctx.lora_set(
                        body if isinstance(body, list) else [body]))
                except ValueError as e:
                    return self._error(400, str(e))
            return self._error(404, f"unknown path {path}")
        except BrokenPipeError:
            pass
        except Exception as e:  # surface handler bugs as 500s, keep serving
            try:
                self._error(500, f"{type(e).__name__}: {e}")
            except Exception:
                pass

    def _embeddings(self, body: dict):
        ctx = self.ctx
        inp = body.get("input", body.get("content", ""))
        if isinstance(inp, str):
            inp = [inp]
        token_lists = []
        for item in inp:
            if isinstance(item, list):
                token_lists.append([int(t) for t in item])
            else:
                token_lists.append(ctx.tok.encode(str(item), add_special=True))
        pooling = body.get("pooling", "mean")
        vecs = ctx.embed(token_lists, pooling)
        data = [{"object": "embedding", "index": i, "embedding": v.tolist()}
                for i, v in enumerate(vecs)]
        n_tok = sum(len(t) for t in token_lists)
        self._json(200, {"object": "list", "data": data,
                         "model": ctx.model_name,
                         "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok}})

    def _rerank(self, body: dict):
        """Jina/TEI-style reranking (tools/server/server.cpp:4000 +
        format_response_rerank): scores sorted desc, trimmed to top_n."""
        ctx = self.ctx
        if ctx.cfg.causal or "cls_out_w" not in ctx.params:
            return self._error(400, "model does not support reranking "
                                    "(no rank pooling head)")
        query = body.get("query", "")
        docs = body.get("documents", [])
        texts = [d.get("text", "") if isinstance(d, dict) else str(d)
                 for d in docs]
        if not query or not texts:
            return self._error(400, "need query + documents")
        top_n = int(body.get("top_n", len(texts)))
        scores = ctx.rerank(query, texts)
        results = sorted(
            ({"index": i, "relevance_score": s} for i, s in enumerate(scores)),
            key=lambda r: -r["relevance_score"])[:top_n]
        if body.get("return_text"):
            for r in results:
                r["text"] = texts[r["index"]]
        n_tok = sum(len(ctx.tok.encode(t, add_special=False)) for t in texts)
        self._json(200, {"model": body.get("model", ctx.model_name),
                         "object": "list",
                         "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok},
                         "results": results})

    def _slot_action(self, path: str, body: dict):
        """POST /slots/{id}?action=save|restore|erase (llama-server parity).

        save/restore are disabled unless the server was started with a
        slot-save directory, and the client filename must be a plain basename
        (the reference gates these behind --slot-save-path and validates the
        filename the same way). All state mutation runs on the inference-loop
        thread via ctx.control() — handler threads never touch the cache."""
        import os as _os

        ctx = self.ctx
        try:
            slot_id = int(path.split("/")[2])
        except (IndexError, ValueError):
            return self._error(400, "bad slot id")
        if not 0 <= slot_id < ctx.n_slots:
            return self._error(400, f"slot {slot_id} out of range")
        action = ""
        if "?" in self.path:
            for kv in self.path.split("?", 1)[1].split("&"):
                if kv.startswith("action="):
                    action = kv.split("=", 1)[1]
        if action == "erase":
            def _erase():
                if ctx.rt[slot_id].task is not None:
                    raise _SlotBusy()
                ctx.memory.clear_slot(slot_id)
            try:
                ctx.control(_erase)
            except _SlotBusy:
                return self._error(409, f"slot {slot_id} busy")
            return self._json(200, {"id_slot": slot_id, "erased": True})
        if action not in ("save", "restore"):
            return self._error(400, f"unknown action '{action}'")
        if not ctx.slot_save_path:
            return self._error(
                400, "slot save/restore disabled (server started without "
                     "a slot-save path)")
        fname = body.get("filename")
        if not fname or not isinstance(fname, str):
            return self._error(400, "filename required")
        if (_os.path.basename(fname) != fname or fname.startswith(".")
                or "/" in fname or "\\" in fname or ".." in fname):
            return self._error(400, "invalid filename")
        fpath = _os.path.join(ctx.slot_save_path, fname)
        try:
            if action == "save":
                def _save():
                    if ctx.rt[slot_id].task is not None:
                        raise _SlotBusy()
                    ctx.memory.save_slot_file(slot_id, fpath)
                    return ctx.memory.slots[slot_id].n_past
                n = ctx.control(_save)
                return self._json(200, {"id_slot": slot_id,
                                        "n_saved": n, "filename": fname})

            def _restore():
                if ctx.rt[slot_id].task is not None:
                    raise _SlotBusy()
                return ctx.memory.load_slot_file(slot_id, fpath)
            n = ctx.control(_restore)
            return self._json(200, {"id_slot": slot_id, "n_restored": n})
        except _SlotBusy:
            return self._error(409, f"slot {slot_id} busy")
        except FileNotFoundError:
            return self._error(400, f"no such saved state '{fname}'")

    def _state_action(self, body: dict):
        """POST /state?action=save|restore {filename}: whole-context session
        files (llama_state_save_file/load_file, include/llama.h:770-884) —
        every slot's cache + token prefixes in one file, so a server restart
        resumes with warm prefix caches. Same gating/validation as /slots."""
        import os as _os

        ctx = self.ctx
        action = ""
        if "?" in self.path:
            for kv in self.path.split("?", 1)[1].split("&"):
                if kv.startswith("action="):
                    action = kv.split("=", 1)[1]
        if action not in ("save", "restore"):
            return self._error(400, f"unknown action '{action}'")
        if not ctx.slot_save_path:
            return self._error(400, "state save/restore disabled (server "
                                    "started without a slot-save path)")
        fname = body.get("filename")
        if not fname or not isinstance(fname, str):
            return self._error(400, "filename required")
        if (_os.path.basename(fname) != fname or fname.startswith(".")
                or "/" in fname or "\\" in fname or ".." in fname):
            return self._error(400, "invalid filename")
        fpath = _os.path.join(ctx.slot_save_path, fname)
        try:
            if action == "save":
                def _save():
                    if any(r.task is not None for r in ctx.rt):
                        raise _SlotBusy()
                    ctx.memory.save_state_file(fpath)
                ctx.control(_save)
                return self._json(200, {"saved": True, "filename": fname})

            def _restore():
                if any(r.task is not None for r in ctx.rt):
                    raise _SlotBusy()
                ctx.memory.load_state_file(fpath)
            ctx.control(_restore)
            return self._json(200, {"restored": True, "filename": fname})
        except _SlotBusy:
            return self._error(409, "slots busy")
        except FileNotFoundError:
            return self._error(400, f"no such saved state '{fname}'")
        except AssertionError as e:
            return self._error(400, f"state mismatch: {e}")

    def _infill(self, body: dict):
        """Fill-in-the-middle completion: <FIM_PRE>prefix<FIM_SUF>suffix
        <FIM_MID> -> generate the middle (llama-server /infill)."""
        ctx = self.ctx
        v = ctx.tok.vocab
        if v.fim_pre_id is None or v.fim_suf_id is None or v.fim_mid_id is None:
            return self._error(400, "model has no FIM tokens")
        pre = ctx.tok.encode(str(body.get("input_prefix", "")), add_special=False)
        suf = ctx.tok.encode(str(body.get("input_suffix", "")), add_special=False)
        tokens = []
        if v.add_bos and v.bos_id is not None:
            tokens.append(v.bos_id)
        tokens += [v.fim_pre_id] + pre + [v.fim_suf_id] + suf + [v.fim_mid_id]
        params = _gen_params(body)
        task = Task(tokens=tokens, params=params)
        ctx.submit(task)
        result = None
        for kind, payload in task.events():
            if kind == "error":
                return self._error(400, str(payload))
            if kind == "done":
                result = payload
        self._json(200, {
            "content": result["text"],
            "stop_type": result["reason"],
            "tokens_predicted": result["stats"]["completion_tokens"],
            "timings": result["stats"],
        })

    # ------------------------------------------- anthropic / responses api

    def _anthropic_messages(self, body: dict):
        """Anthropic Messages API subset (reference: server.cpp /v1/messages)."""
        ctx = self.ctx
        msgs = _anth_to_openai(body, body.get("messages", []))
        params = _gen_params(body)
        params.max_tokens = int(body.get("max_tokens", 128))
        if body.get("stop_sequences"):
            params.stop = [str(s) for s in body["stop_sequences"]]
        prompt = apply_chat_template(ctx, msgs)
        tokens = ctx.tok.encode(prompt, add_special=True, parse_special=True)
        task = Task(tokens=tokens, params=params)
        ctx.submit(task)
        result = None
        for kind, payload in task.events():
            if kind == "error":
                return self._error(400, str(payload))
            if kind == "done":
                result = payload
        stats = result["stats"]
        stop_reason = {"stop": "end_turn", "length": "max_tokens"}.get(
            result["reason"], "end_turn")
        self._json(200, {
            "id": "msg_" + uuid.uuid4().hex[:16],
            "type": "message",
            "role": "assistant",
            "model": body.get("model") or ctx.model_name,
            "content": [{"type": "text", "text": result["text"]}],
            "stop_reason": stop_reason,
            "stop_sequence": None,
            "usage": {"input_tokens": stats["prompt_tokens"],
                      "output_tokens": stats["completion_tokens"]},
        })

    def _openai_responses(self, body: dict):
        """OpenAI Responses API subset."""
        ctx = self.ctx
        inp = body.get("input", "")
        if isinstance(inp, str):
            msgs = [{"role": "user", "content": inp}]
        else:
            msgs = [{"role": m.get("role", "user"), "content": m.get("content", "")}
                    for m in inp]
        if body.get("instructions"):
            msgs.insert(0, {"role": "system", "content": body["instructions"]})
        params = _gen_params(body)
        if body.get("max_output_tokens"):
            params.max_tokens = int(body["max_output_tokens"])
        prompt = apply_chat_template(ctx, msgs)
        tokens = ctx.tok.encode(prompt, add_special=True, parse_special=True)
        task = Task(tokens=tokens, params=params)
        ctx.submit(task)
        result = None
        for kind, payload in task.events():
            if kind == "error":
                return self._error(400, str(payload))
            if kind == "done":
                result = payload
        stats = result["stats"]
        self._json(200, {
            "id": "resp_" + uuid.uuid4().hex[:16],
            "object": "response",
            "status": "completed",
            "model": body.get("model") or ctx.model_name,
            "output": [{
                "type": "message", "role": "assistant",
                "content": [{"type": "output_text", "text": result["text"]}],
            }],
            "output_text": result["text"],
            "usage": {"input_tokens": stats["prompt_tokens"],
                      "output_tokens": stats["completion_tokens"],
                      "total_tokens": stats["prompt_tokens"] + stats["completion_tokens"]},
        })

    # -------------------------------------------------------- completion

    def _completion(self, body: dict, chat: bool):
        ctx = self.ctx
        params = _gen_params(body)
        created = int(time.time())
        rid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:16]
        tool_fmt = None
        if chat:
            msgs = body.get("messages", [])
            tools = body.get("tools")
            if tools and body.get("tool_choice") != "none":
                from .chat import get_template_src
                from .toolcall import detect_format, inject_tools

                tool_fmt = detect_format(get_template_src(ctx))
                msgs = inject_tools(msgs, tools, tool_fmt)
                prompt_text = apply_chat_template(ctx, msgs, tools=tools)
            else:
                prompt_text = apply_chat_template(ctx, msgs)
            import binascii

            try:
                images = _extract_images(msgs)
            except (ValueError, binascii.Error) as e:  # remote URL / bad base64
                return self._error(400, f"bad image: {e}")
            if images:
                if ctx.mtmd is None:
                    return self._error(
                        400, "request has images but no --mmproj is loaded")
                try:
                    chunks = ctx.mtmd.tokenize(
                        ctx.tok, prompt_text, len(images),
                        add_special=True, parse_special=True)
                    task_embeds, tokens = ctx.mtmd.embed_prompt(
                        ctx.params, chunks, images)
                except ValueError as e:
                    return self._error(400, str(e))
            else:
                task_embeds = None
                tokens = ctx.tok.encode(prompt_text, add_special=True,
                                        parse_special=True)
        else:
            prompt = body.get("prompt", "")
            if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
                tokens = [int(t) for t in prompt]
            else:
                tokens = ctx.tok.encode(str(prompt), add_special=True,
                                        parse_special=bool(body.get("parse_special", True)))
            task_embeds = None

        task = Task(tokens=tokens, params=params, embeds=task_embeds)
        ctx.submit(task)
        model = body.get("model") or ctx.model_name

        if params.stream:
            self._sse_start()
            try:
                for kind, payload in task.events():
                    if kind == "error":
                        self._sse({"error": payload})
                        break
                    if kind == "delta":
                        self._sse(_chunk(rid, created, model, payload["text"], None, chat))
                    elif kind == "done":
                        self._sse(_chunk(rid, created, model, "",
                                         payload["reason"], chat, payload["stats"]))
                self._sse_done()
            except BrokenPipeError:
                task.cancelled.set()
            return

        result = None
        for kind, payload in task.events():
            if kind == "error":
                return self._error(400, str(payload))
            if kind == "done":
                result = payload
        stats = result["stats"]
        usage = {
            "prompt_tokens": stats["prompt_tokens"],
            "completion_tokens": stats["completion_tokens"],
            "total_tokens": stats["prompt_tokens"] + stats["completion_tokens"],
        }
        if chat:
            message = {"role": "assistant", "content": result["text"]}
            finish = result["reason"]
            if tool_fmt is not None:
                from .toolcall import parse_tool_calls

                content, calls = parse_tool_calls(result["text"], tool_fmt)
                if calls:
                    message = {"role": "assistant",
                               "content": content or None,
                               "tool_calls": calls}
                    finish = "tool_calls"
            self._json(200, {
                "id": rid, "object": "chat.completion", "created": created,
                "model": model, "usage": usage, "timings": stats,
                "choices": [{"index": 0, "finish_reason": finish,
                             "message": message}],
            })
        else:
            lp = None
            if result.get("logprobs"):
                tokp = result["logprobs"]
                lp = {
                    "tokens": [self.ctx.tok.decode([e["token"]])
                               for e in tokp] if self.ctx.tok else None,
                    "token_logprobs": [e["logprob"] for e in tokp],
                    "top_logprobs": [
                        {(self.ctx.tok.decode([t]) if self.ctx.tok else str(t)): v
                         for t, v in e["top"]} for e in tokp],
                }
            self._json(200, {
                "id": rid, "object": "text_completion", "created": created,
                "model": model, "usage": usage, "timings": stats,
                "choices": [{"index": 0, "finish_reason": result["reason"],
                             "text": result["text"], "logprobs": lp}],
            })


def _extract_images(msgs: list) -> list:
    """Collect media items from OpenAI content parts, in marker order:
    raw image bytes, or ("audio_wav", bytes) for input_audio parts.

    Only ``data:`` URIs (base64) and raw base64 strings are accepted —
    the serving host has no egress; remote URLs are a client-side concern
    (the reference downloads them in tools/server; here they 400)."""
    import base64

    out = []
    for m in msgs:
        c = m.get("content")
        if not isinstance(c, list):
            continue
        for p in c:
            if not isinstance(p, dict):
                continue
            if p.get("type") == "input_audio" or "input_audio" in p:
                a = p.get("input_audio") or {}
                data = a.get("data", "") if isinstance(a, dict) else a
                fmt = (a.get("format", "wav") if isinstance(a, dict)
                       else "wav")
                if fmt != "wav":
                    raise ValueError(f"audio format {fmt!r} unsupported "
                                     "(wav only)")
                out.append(("audio_wav", base64.b64decode(data)))
            elif (p.get("type") in ("image_url", "input_image")
                    or "image_url" in p):
                u = p.get("image_url") or p.get("image") or ""
                if isinstance(u, dict):
                    u = u.get("url", "")
                if u.startswith("data:"):
                    u = u.split(",", 1)[-1]
                elif u.startswith(("http://", "https://")):
                    raise ValueError("remote image URLs unsupported; "
                                     "send a data: URI")
                out.append(base64.b64decode(u))
    return out


def _anth_to_openai(body: dict, msgs: list) -> list:
    """Anthropic messages (+top-level system) -> chat-template messages."""
    out = []
    if body.get("system"):
        sys_c = body["system"]
        if isinstance(sys_c, list):
            sys_c = "".join(p.get("text", "") for p in sys_c if isinstance(p, dict))
        out.append({"role": "system", "content": sys_c})
    for m in msgs:
        c = m.get("content", "")
        if isinstance(c, list):
            c = "".join(p.get("text", "") for p in c
                        if isinstance(p, dict) and p.get("type") == "text")
        out.append({"role": m.get("role", "user"), "content": c})
    return out


def _chunk(rid, created, model, text, finish, chat, stats=None):
    if chat:
        delta = {"content": text} if text else {}
        obj = {"id": rid, "object": "chat.completion.chunk", "created": created,
               "model": model,
               "choices": [{"index": 0, "delta": delta, "finish_reason": finish}]}
    else:
        obj = {"id": rid, "object": "text_completion", "created": created,
               "model": model,
               "choices": [{"index": 0, "text": text, "finish_reason": finish}]}
    if stats:
        obj["timings"] = stats
    return obj


def serve(ctx: ServerContext, host: str = "127.0.0.1", port: int = 8080,
          block: bool = True):
    """Start the inference loop + HTTP server. Returns the HTTPServer."""
    handler = type("BoundHandler", (Handler,), {"ctx": ctx})
    srv = ThreadingHTTPServer((host, port), handler)
    ctx.start()
    if block:
        try:
            srv.serve_forever()
        finally:
            ctx.stop()
    else:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
    return srv
