"""Jinja-subset engine vs known chat-template semantics (test-jinja analogue)."""
import pytest

from tpullm.server.jinja import Template, TemplateError, render_chat_template

MSGS = [
    {"role": "system", "content": "be brief"},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "bye?"},
]

LLAMA3_TMPL = (
    "{{ bos_token }}{% for message in messages %}"
    "{{ '<|start_header_id|>' + message['role'] + '<|end_header_id|>\\n\\n' "
    "+ message['content'] | trim + '<|eot_id|>' }}{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start_header_id|>assistant<|end_header_id|>\\n\\n' }}{% endif %}"
)

CHATML_TMPL = (
    "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\\n'"
    " + message['content'] + '<|im_end|>' + '\\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\\n' }}{% endif %}"
)

MISTRAL_TMPL = (
    "{{ bos_token }}{% for message in messages %}"
    "{% if message['role'] == 'user' %}{{ '[INST] ' + message['content'] + ' [/INST]' }}"
    "{% elif message['role'] == 'assistant' %}{{ message['content'] + eos_token }}"
    "{% endif %}{% endfor %}"
)


def test_basic_expr():
    assert Template("{{ 1 + 2 }}").render() == "3"
    assert Template("{{ 'a' ~ 'b' ~ 1 }}").render() == "ab1"
    assert Template("{{ x if y else 'z' }}").render(x="v", y=False) == "z"
    assert Template("{{ items | length }}").render(items=[1, 2, 3]) == "3"
    assert Template("{{ s | trim | upper }}").render(s="  hi ") == "HI"
    assert Template("{{ d['k'] }}{{ d.k }}").render(d={"k": "v"}) == "vv"
    assert Template("{{ s.strip().startswith('h') }}").render(s=" hi") == "true"


def test_if_for_set():
    t = Template("{% set n = 0 %}{% for x in xs %}{% if x % 2 == 0 %}"
                 "{{ x }},{% endif %}{% endfor %}")
    assert t.render(xs=[1, 2, 3, 4]) == "2,4,"
    t = Template("{% for m in ms %}{{ loop.index }}:{{ m.role }}"
                 "{% if not loop.last %};{% endif %}{% endfor %}")
    assert t.render(ms=MSGS[:2]) == "1:system;2:user"


def test_whitespace_control():
    t = Template("a\n  {%- if true %}x{% endif -%}\n  b")
    assert t.render() == "axb"


def test_namespace_set():
    t = Template("{% set ns = namespace(n=0) %}{% for x in xs %}"
                 "{% set ns.n = ns.n + x %}{% endfor %}{{ ns.n }}")
    assert t.render(xs=[1, 2, 3]) == "6"


def test_llama3_template():
    out = render_chat_template(LLAMA3_TMPL, MSGS, bos_token="<|begin_of_text|>")
    assert out.startswith("<|begin_of_text|><|start_header_id|>system")
    assert out.count("<|eot_id|>") == 4
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_chatml_template():
    out = render_chat_template(CHATML_TMPL, MSGS)
    assert out.count("<|im_start|>") == 5
    assert out.endswith("<|im_start|>assistant\n")


def test_mistral_template():
    out = render_chat_template(MISTRAL_TMPL, MSGS[1:], bos_token="<s>",
                               eos_token="</s>")
    assert out == "<s>[INST] hi [/INST]hello</s>[INST] bye? [/INST]"


def test_raise_exception():
    t = "{% if messages[0]['role'] != 'user' %}{{ raise_exception('bad') }}{% endif %}ok"
    with pytest.raises(TemplateError):
        render_chat_template(t, MSGS)
    assert render_chat_template(t, MSGS[1:]) == "ok"


def test_undefined_safe():
    assert Template("{{ nothing }}|{{ nothing is defined }}").render() == "|false"
    assert Template("{{ x | default('d') }}").render() == "d"


def test_tojson_filter():
    assert Template("{{ d | tojson }}").render(d={"a": 1}) == '{"a": 1}'
