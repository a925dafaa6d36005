"""Own jinja engine vs the jinja2 oracle (HF environment semantics).

The reference ships a zero-dep jinja engine (src/TokenSet/jinja.hpp,
2143 LoC) to run ``tokenizer_config.json`` chat templates; ours is
koifish_tpu/data/jinja.py. Every test renders a real-world-shaped
template with BOTH engines and asserts byte-identical output."""
import jinja2
import jinja2.ext
import pytest

from koifish_tpu.data.jinja import Template, TemplateError, render_template


def oracle(src, **ctx):
    """jinja2 with HF transformers' environment semantics
    (_compile_jinja_template: trim/lstrip blocks, loopcontrols, a
    non-escaping tojson override)."""
    import json as _json
    env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True,
                             extensions=[jinja2.ext.loopcontrols],
                             keep_trailing_newline=True)
    env.globals["raise_exception"] = lambda m: (_ for _ in ()).throw(
        jinja2.exceptions.TemplateError(m))
    env.filters["tojson"] = lambda x, ensure_ascii=False, indent=None, \
        separators=None, sort_keys=False: _json.dumps(
            x, ensure_ascii=ensure_ascii, indent=indent,
            separators=separators, sort_keys=sort_keys)
    return env.from_string(src).render(**ctx)


def both(src, **ctx):
    exp = oracle(src, **ctx)
    got = render_template(src, **ctx)
    assert got == exp, f"\nGOT: {got!r}\nEXP: {exp!r}"
    return got


MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi there"},
    {"role": "assistant", "content": "<think>\nhmm\n</think>\n\nHello! How can I assist you today?"},
    {"role": "user", "content": "How many r in strawberry?"},
]


QWEN3_TEMPLATE = """{%- if tools %}
    {{- '<|im_start|>system\\n' }}
    {%- if messages[0].role == 'system' %}
        {{- messages[0].content + '\\n\\n' }}
    {%- endif %}
    {{- "# Tools\\n\\nYou may call one or more functions to assist with the user query.\\n\\n<tools>" }}
    {%- for tool in tools %}
        {{- "\\n" }}
        {{- tool | tojson }}
    {%- endfor %}
    {{- "\\n</tools><|im_end|>\\n" }}
{%- else %}
    {%- if messages[0].role == 'system' %}
        {{- '<|im_start|>system\\n' + messages[0].content + '<|im_end|>\\n' }}
    {%- endif %}
{%- endif %}
{%- set ns = namespace(multi_step_tool=true, last_query_index=messages|length - 1) %}
{%- for message in messages[::-1] %}
    {%- set index = (messages|length - 1) - loop.index0 %}
    {%- if ns.multi_step_tool and message.role == "user" and message.content is string and not(message.content.startswith('<tool_response>') and message.content.endswith('</tool_response>')) %}
        {%- set ns.multi_step_tool = false %}
        {%- set ns.last_query_index = index %}
    {%- endif %}
{%- endfor %}
{%- for message in messages %}
    {%- if (message.role == "user") or (message.role == "system" and not loop.first) %}
        {{- '<|im_start|>' + message.role + '\\n' + message.content + '<|im_end|>' + '\\n' }}
    {%- elif message.role == "assistant" %}
        {%- set content = message.content %}
        {%- set reasoning_content = '' %}
        {%- if message.reasoning_content is string %}
            {%- set reasoning_content = message.reasoning_content %}
        {%- else %}
            {%- if '</think>' in message.content %}
                {%- set content = message.content.split('</think>')[-1].lstrip('\\n') %}
                {%- set reasoning_content = message.content.split('</think>')[0].rstrip('\\n').split('<think>')[-1].lstrip('\\n') %}
            {%- endif %}
        {%- endif %}
        {%- if loop.index0 > ns.last_query_index %}
            {%- if loop.last or (not loop.last and reasoning_content) %}
                {{- '<|im_start|>' + message.role + '\\n<think>\\n' + reasoning_content.strip('\\n') + '\\n</think>\\n\\n' + content.lstrip('\\n') + '<|im_end|>\\n' }}
            {%- else %}
                {{- '<|im_start|>' + message.role + '\\n' + content + '<|im_end|>' + '\\n' }}
            {%- endif %}
        {%- else %}
            {{- '<|im_start|>' + message.role + '\\n' + content + '<|im_end|>' + '\\n' }}
        {%- endif %}
    {%- elif message.role == "tool" %}
        {%- if loop.first or (messages[loop.index0 - 1].role != "tool") %}
            {{- '<|im_start|>user' }}
        {%- endif %}
        {{- '\\n<tool_response>\\n' + message.content + '\\n</tool_response>' }}
        {%- if loop.last or (messages[loop.index0 + 1].role != "tool") %}
            {{- '<|im_end|>\\n' }}
        {%- endif %}
    {%- endif %}
{%- endfor %}
{%- if add_generation_prompt %}
    {{- '<|im_start|>assistant\\n' }}
    {%- if enable_thinking is defined and enable_thinking is false %}
        {{- '<think>\\n\\n</think>\\n\\n' }}
    {%- endif %}
{%- endif %}"""


def test_qwen3_template_thinking_modes():
    for et in (True, False):
        for agp in (True, False):
            out = both(QWEN3_TEMPLATE, messages=MSGS, tools=None,
                       add_generation_prompt=agp, enable_thinking=et)
    assert "<|im_start|>assistant" in out


def test_qwen3_template_with_tools_and_tool_turns():
    tools = [{"type": "function", "function": {
        "name": "get_weather", "parameters": {
            "type": "object",
            "properties": {"city": {"type": "string"}}}}}]
    msgs = MSGS + [
        {"role": "assistant", "content": "calling tool"},
        {"role": "tool", "content": '{"temp": 21}'},
        {"role": "tool", "content": '{"wind": 5}'},
        {"role": "user", "content": "thanks"},
    ]
    both(QWEN3_TEMPLATE, messages=msgs, tools=tools,
         add_generation_prompt=True, enable_thinking=True)


LLAMA3_TEMPLATE = """{%- set date_string = "26 Jul 2024" %}
{%- if messages[0]['role'] == 'system' %}
    {%- set system_message = messages[0]['content'] | trim %}
    {%- set messages = messages[1:] %}
{%- else %}
    {%- set system_message = "" %}
{%- endif %}
{{- "<|start_header_id|>system<|end_header_id|>\\n\\n" }}
{{- "Cutting Knowledge Date: December 2023\\n" }}
{{- "Today Date: " + date_string + "\\n\\n" }}
{{- system_message }}
{{- "<|eot_id|>" }}
{%- for message in messages %}
    {%- if message['role'] not in ['ipython', 'tool'] %}
        {{- '<|start_header_id|>' + message['role'] + '<|end_header_id|>\\n\\n' + message['content'] | trim + '<|eot_id|>' }}
    {%- endif %}
{%- endfor %}
{%- if add_generation_prompt %}
    {{- '<|start_header_id|>assistant<|end_header_id|>\\n\\n' }}
{%- endif %}"""


def test_llama3_template():
    both(LLAMA3_TEMPLATE, messages=MSGS, add_generation_prompt=True)


MISTRAL_TEMPLATE = """{{- bos_token }}
{%- for message in messages %}
    {%- if (message['role'] == 'user') != (loop.index0 % 2 == 0) %}
        {{- raise_exception('roles must alternate user/assistant') }}
    {%- endif %}
    {%- if message['role'] == 'user' %}
        {{- '[INST] ' + message['content'] + ' [/INST]' }}
    {%- elif message['role'] == 'assistant' %}
        {{- ' ' + message['content'] + eos_token }}
    {%- else %}
        {{- raise_exception('Only user and assistant roles are supported!') }}
    {%- endif %}
{%- endfor %}"""


def test_mistral_template_and_raise_exception():
    msgs = [{"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"}]
    both(MISTRAL_TEMPLATE, messages=msgs, bos_token="<s>", eos_token="</s>")
    with pytest.raises(TemplateError):
        render_template(MISTRAL_TEMPLATE,
                        messages=[{"role": "system", "content": "x"},
                                  {"role": "user", "content": "hi"}],
                        bos_token="<s>", eos_token="</s>")


def test_expressions_and_filters():
    cases = [
        ("{{ 1 + 2 * 3 }}", {}),
        ("{{ (1 + 2) * 3 // 2 }}", {}),
        ("{{ 7 % 3 }}{{ 2 ** 5 }}{{ -4 }}", {}),
        ("{{ 'a' ~ 1 ~ true }}", {}),
        ("{{ x | default('d') }}{{ y | default('e') }}", {"x": "v"}),
        ("{{ xs | join(', ') }}", {"xs": ["a", "b"]}),
        ("{{ xs | length }}{{ xs | first }}{{ xs | last }}", {"xs": [3, 1, 2]}),
        ("{{ xs | sort | join(',') }}", {"xs": [3, 1, 2]}),
        ("{{ s | upper }} {{ s | replace('l', 'L') }}", {"s": "hello"}),
        ("{{ d | tojson }}", {"d": {"a": 1, "b": [1, 2], "c": "x\u00e9"}}),
        ("{{ xs | map(attribute='n') | join('/') }}",
         {"xs": [{"n": 1}, {"n": 2}]}),
        ("{{ xs | selectattr('ok') | map(attribute='n') | list | length }}",
         {"xs": [{"n": 1, "ok": True}, {"n": 2, "ok": False}]}),
        ("{{ 'yes' if v > 3 else 'no' }}", {"v": 5}),
        ("{{ v is defined }} {{ w is defined }} {{ v is number }}", {"v": 1}),
        ("{{ v is string }} {{ v is mapping }}", {"v": {}}),
        ("{{ 'a' in s }} {{ 'z' not in s }}", {"s": "abc"}),
        ("{{ s[1:] }}{{ s[:-1] }}{{ s[::-1] }}", {"s": "abcd"}),
        ("{{ s.startswith('ab') }} {{ s.split('b') | join('|') }}",
         {"s": "abcb"}),
        ("{{ range(3) | list | join('-') }}", {}),
        ("{{ none is none }} {{ 1 == 1.0 }}", {}),
        ("{% set a, b = pair %}{{ a }}{{ b }}", {"pair": (1, 2)}),
    ]
    for src, ctx in cases:
        both(src, **ctx)


def test_statements():
    both("{% if x %}A{% elif y %}B{% else %}C{% endif %}", x=0, y=1)
    both("{% for i in range(5) %}{% if i == 3 %}{% break %}{% endif %}"
         "{{ i }}{% endfor %}")
    both("{% for i in range(5) %}{% if i % 2 %}{% continue %}{% endif %}"
         "{{ i }}{% endfor %}")
    both("{% for x in xs if x > 1 %}{{ x }},{% else %}none{% endfor %}",
         xs=[0, 1])
    both("{% for x in xs %}{{ loop.index }}:{{ loop.index0 }}:"
         "{{ loop.first }}:{{ loop.last }}:{{ loop.length }}:{{ x }} "
         "{% endfor %}", xs=["a", "b", "c"])
    both("{% set v %}in-{{ 1 + 1 }}{% endset %}[{{ v }}]")
    both("{% macro hdr(role, tag='h') %}<{{ tag }}>{{ role }}</{{ tag }}>"
         "{% endmacro %}{{ hdr('user') }}{{ hdr('sys', tag='x') }}")
    both("{% for k, v in d.items() %}{{ k }}={{ v }};{% endfor %}",
         d={"a": 1, "b": 2})


def test_whitespace_control_matrix():
    both("a\n  {% if true %}\n  x\n  {% endif %}\nb")
    both("a\n  {%- if true %}\n  x\n  {%- endif %}\nb")
    both("{{ 'x' }}\n  {{- 'y' }}")
    both("{% for i in range(2) %}\n  line{{ i }}\n{% endfor %}")


def test_loop_nested_namespace_state():
    src = ("{% set ns = namespace(n=0) %}"
           "{% for x in xs %}{% set ns.n = ns.n + x %}{% endfor %}"
           "{{ ns.n }}")
    both(src, xs=[1, 2, 3])


def test_unknown_filter_raises():
    with pytest.raises(TemplateError):
        render_template("{{ x | frobnicate }}", x=1)


def test_undefined_semantics():
    # printing undefined -> ""; comparisons -> False; is defined works
    both("[{{ nope }}]")
    both("{{ nope == 'x' }}")
    # intentional difference: jinja2's default Undefined raises on
    # attribute access; ours chains (like ChainableUndefined) so guarded
    # templates render instead of erroring
    assert render_template("{{ nope.attr is defined }}") == "False"


def test_template_class_reuse():
    t = Template("{{ a }}+{{ b }}")
    assert t.render(a=1, b=2) == "1+2"
    assert t.render(a="x", b="y") == "x+y"
