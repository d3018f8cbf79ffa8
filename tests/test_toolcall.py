"""Tool-call formats: detection, prompt injection, parsing (common/chat.cpp
format handlers analogue), plus a grammar-forced server e2e."""
import json

from tpullm.server.toolcall import (detect_format, inject_tools,
                                    parse_tool_calls, tools_system_prompt)

TOOLS = [{"type": "function", "function": {
    "name": "get_weather",
    "description": "Get the weather",
    "parameters": {"type": "object",
                   "properties": {"city": {"type": "string"}},
                   "required": ["city"]}}}]


def test_detect_format():
    assert detect_format("{% if tools %}<tool_call>{% endif %}") == "hermes"
    assert detect_format("... [TOOL_CALLS] ...") == "mistral"
    assert detect_format("<|python_tag|> stuff") == "llama3"
    assert detect_format("{{ messages }}") == "generic"
    assert detect_format(None) == "generic"


def test_hermes_parse():
    text = ('thinking...\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}\n</tool_call>')
    content, calls = parse_tool_calls(text, "hermes")
    assert content == "thinking..."
    assert len(calls) == 1
    c = calls[0]
    assert c["type"] == "function" and c["id"].startswith("call_")
    assert c["function"]["name"] == "get_weather"
    assert json.loads(c["function"]["arguments"]) == {"city": "Paris"}
    # multiple calls
    text2 = text + '<tool_call>{"name": "b", "arguments": {}}</tool_call>'
    _, calls2 = parse_tool_calls(text2, "hermes")
    assert [c["function"]["name"] for c in calls2] == ["get_weather", "b"]
    # malformed JSON stays as content
    content3, calls3 = parse_tool_calls("<tool_call>oops</tool_call>", "hermes")
    assert not calls3 and "oops" in content3


def test_mistral_parse():
    text = '[TOOL_CALLS][{"name": "get_weather", "arguments": {"city": "NYC"}}]'
    content, calls = parse_tool_calls(text, "mistral")
    assert content == "" and len(calls) == 1
    assert json.loads(calls[0]["function"]["arguments"])["city"] == "NYC"


def test_llama3_and_generic_parse():
    content, calls = parse_tool_calls(
        '{"name": "get_weather", "parameters": {"city": "SF"}}', "llama3")
    assert content == "" and calls[0]["function"]["name"] == "get_weather"
    # generic wrapper object
    content, calls = parse_tool_calls(
        '{"tool_calls": [{"name": "a", "arguments": {"x": 1}}], '
        '"response": "done"}', "generic")
    assert content == "done" and calls[0]["function"]["name"] == "a"
    # fenced json
    content, calls = parse_tool_calls(
        'Sure!\n```json\n{"tool_calls": [{"name": "a", "arguments": {}}]}\n```',
        "generic")
    assert calls and calls[0]["function"]["name"] == "a"
    # plain text stays plain
    content, calls = parse_tool_calls("just an answer", "generic")
    assert content == "just an answer" and not calls


def test_inject_tools():
    msgs = [{"role": "user", "content": "hi"}]
    out = inject_tools(msgs, TOOLS, "generic")
    assert out[0]["role"] == "system" and "get_weather" in out[0]["content"]
    assert out[1] == msgs[0]
    # merges into an existing system message
    msgs2 = [{"role": "system", "content": "be nice"}] + msgs
    out2 = inject_tools(msgs2, TOOLS, "generic")
    assert len(out2) == 2 and out2[0]["content"].startswith("be nice")
    # native formats untouched (the template renders tools itself)
    assert inject_tools(msgs, TOOLS, "hermes") == msgs
    assert "get_weather" in tools_system_prompt(TOOLS)


def test_server_tools_e2e(tmp_path):
    """Grammar-forced output makes the synth model 'call' a tool for real."""
    import socket
    import urllib.request

    from tpullm.gguf.constants import GGMLType
    from tpullm.runtime.loader import load_model
    from tpullm.server.context import ServerContext
    from tpullm.server.http import serve
    from tpullm.tokenizer import Tokenizer
    from tpullm.utils.synth import build_llama_gguf

    path = str(tmp_path / "t.gguf")
    build_llama_gguf(path, vocab_size=512, n_embd=128, n_layer=1, n_head=4,
                     n_head_kv=2, n_ff=128, qtype=GGMLType.Q4_0,
                     with_vocab=True)
    cfg, params, g = load_model(path)
    tok = Tokenizer.from_gguf(g)
    ctx = ServerContext(cfg, params, tok, n_slots=1, max_seq_len=1024,
                        decode_chunk=4, prefill_chunk=128)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = serve(ctx, "127.0.0.1", port, block=False)
    try:
        # grammar that only admits the exact tool-call JSON (the toy SPM
        # vocab carries the JSON structural chars, so this is producible)
        payload = '{"tool_calls": [{"name": "get", "arguments": {}}]}'
        gbnf = 'root ::= ' + json.dumps(payload)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            json.dumps({
                "messages": [{"role": "user", "content": "weather?"}],
                "tools": TOOLS, "max_tokens": 64, "temperature": 0,
                "grammar": gbnf,
            }).encode(), {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            out = json.loads(r.read())
        msg = out["choices"][0]["message"]
        assert out["choices"][0]["finish_reason"] == "tool_calls", out
        assert msg["tool_calls"][0]["function"]["name"] == "get"
        assert json.loads(msg["tool_calls"][0]["function"]["arguments"]) == {}
    finally:
        srv.shutdown()
        ctx.stop()
