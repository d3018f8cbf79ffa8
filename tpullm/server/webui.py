"""Built-in chat web UI served at GET / (the reference ships a Svelte app
under tools/server/webui; this is a dependency-free single-file analogue:
streaming chat against /v1/chat/completions, sampler controls, and server
props)."""

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>tpullm</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
:root { --bg:#111418; --fg:#e8eaed; --mut:#9aa0a6; --me:#1a3a5c; --bot:#20242b; }
* { box-sizing:border-box; }
body { margin:0; background:var(--bg); color:var(--fg);
       font:15px/1.5 system-ui, sans-serif; display:flex; flex-direction:column;
       height:100vh; }
header { padding:10px 16px; border-bottom:1px solid #2a2e35;
         display:flex; gap:16px; align-items:baseline; }
header h1 { font-size:16px; margin:0; }
header span { color:var(--mut); font-size:12px; }
#log { flex:1; overflow-y:auto; padding:16px; }
.msg { max-width:52em; margin:8px auto; padding:10px 14px; border-radius:10px;
       white-space:pre-wrap; }
.me  { background:var(--me); }
.bot { background:var(--bot); }
.sys { color:var(--mut); font-size:12px; text-align:center; }
footer { padding:12px 16px; border-top:1px solid #2a2e35; }
#row { display:flex; gap:8px; max-width:56em; margin:0 auto; }
textarea { flex:1; resize:none; background:#181c22; color:var(--fg);
           border:1px solid #2a2e35; border-radius:8px; padding:8px; }
button { background:#2b5a8c; color:#fff; border:0; border-radius:8px;
         padding:0 18px; cursor:pointer; }
button:disabled { opacity:.5; }
#opts { display:flex; gap:12px; max-width:56em; margin:6px auto 0;
        color:var(--mut); font-size:12px; }
#opts input { width:64px; background:#181c22; color:var(--fg);
              border:1px solid #2a2e35; border-radius:4px; padding:2px 6px; }
</style></head><body>
<header><h1>tpullm</h1><span id="props">connecting…</span></header>
<div id="log"></div>
<footer>
 <div id="row">
  <textarea id="inp" rows="2" placeholder="Send a message… (Enter to send, Shift+Enter for newline)"></textarea>
  <button id="send">Send</button>
 </div>
 <div id="opts">
  temp <input id="temp" value="0.8"> top_p <input id="top_p" value="0.95">
  max_tokens <input id="max" value="512">
  <label><input type="checkbox" id="clear_btn"> clear on send</label>
  <a href="#" id="reset" style="color:var(--mut)">reset chat</a>
 </div>
</footer>
<script>
const log = document.getElementById('log');
const inp = document.getElementById('inp');
const send = document.getElementById('send');
let msgs = [];
fetch('/props').then(r => r.json()).then(p => {
  document.getElementById('props').textContent =
    `${p.model} · ${p.arch} · ctx ${p.n_ctx} · ${p.n_slots} slots`;
}).catch(() => {});
function add(cls, text) {
  const d = document.createElement('div');
  d.className = 'msg ' + cls; d.textContent = text;
  log.appendChild(d); log.scrollTop = log.scrollHeight; return d;
}
document.getElementById('reset').onclick = (e) => {
  e.preventDefault(); msgs = []; log.innerHTML = '';
  add('sys', 'chat reset');
};
async function go() {
  const text = inp.value.trim();
  if (!text) return;
  inp.value = ''; send.disabled = true;
  msgs.push({role: 'user', content: text});
  add('me', text);
  const out = add('bot', '');
  try {
    const r = await fetch('/v1/chat/completions', {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({
        messages: msgs, stream: true,
        temperature: parseFloat(document.getElementById('temp').value) || 0,
        top_p: parseFloat(document.getElementById('top_p').value) || 1,
        max_tokens: parseInt(document.getElementById('max').value) || 256,
      })});
    if (!r.ok) { out.textContent = 'error: ' + await r.text(); return; }
    const rd = r.body.getReader(); const dec = new TextDecoder();
    let buf = '', full = '';
    for (;;) {
      const {done, value} = await rd.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      let i;
      while ((i = buf.indexOf('\\n')) >= 0) {
        const line = buf.slice(0, i).trim(); buf = buf.slice(i + 1);
        if (!line.startsWith('data:')) continue;
        const data = line.slice(5).trim();
        if (data === '[DONE]') continue;
        try {
          const js = JSON.parse(data);
          const d = js.choices?.[0]?.delta?.content || '';
          if (d) { full += d; out.textContent = full;
                   log.scrollTop = log.scrollHeight; }
        } catch (e) {}
      }
    }
    msgs.push({role: 'assistant', content: full});
  } catch (e) { out.textContent = 'error: ' + e; }
  finally { send.disabled = false; inp.focus(); }
}
send.onclick = go;
inp.addEventListener('keydown', (e) => {
  if (e.key === 'Enter' && !e.shiftKey) { e.preventDefault(); go(); }
});
add('sys', 'ready');
</script></body></html>
"""
