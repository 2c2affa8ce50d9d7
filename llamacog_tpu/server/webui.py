"""Built-in chat web UI (role of the reference's tools/server/webui).

A single self-contained page served at GET /: streams from
/v1/chat/completions over SSE, keeps the conversation client-side, and
exposes temperature / max-tokens controls. No build step, no external
assets — the reference ships a compiled Svelte bundle; this keeps the
same capability surface with zero vendored artifacts.
"""

WEBUI_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>llamacog server</title>
<style>
  :root { color-scheme: light dark; }
  * { box-sizing: border-box; }
  body { font: 15px/1.5 system-ui, sans-serif; margin: 0; display: flex;
         flex-direction: column; height: 100vh; }
  header { padding: .6rem 1rem; border-bottom: 1px solid #8884;
           display: flex; gap: 1rem; align-items: center; flex-wrap: wrap; }
  header h1 { font-size: 1rem; margin: 0; }
  header label { font-size: .8rem; opacity: .8; }
  header input { width: 4.5rem; }
  #log { flex: 1; overflow-y: auto; padding: 1rem; }
  .msg { max-width: 46rem; margin: 0 auto .8rem; padding: .6rem .9rem;
         border-radius: .6rem; white-space: pre-wrap; word-break: break-word; }
  .user { background: #4a6cf722; border: 1px solid #4a6cf744; }
  .assistant { background: #8882; }
  .meta { font-size: .7rem; opacity: .6; margin: -0.5rem auto .8rem;
          max-width: 46rem; }
  form { display: flex; gap: .5rem; padding: .8rem 1rem; border-top: 1px solid #8884; }
  textarea { flex: 1; resize: none; font: inherit; padding: .5rem;
             border-radius: .5rem; border: 1px solid #8886; }
  button { font: inherit; padding: .5rem 1.2rem; border-radius: .5rem;
           border: 1px solid #8886; cursor: pointer; }
</style>
</head>
<body>
<header>
  <h1>llamacog</h1>
  <span id="model" style="opacity:.7"></span>
  <label>temp <input id="temp" type="number" step="0.1" value="0.8"></label>
  <label>max tokens <input id="maxtok" type="number" value="512"></label>
  <button id="clear" type="button">clear</button>
</header>
<div id="log"></div>
<form id="f">
  <textarea id="inp" rows="2" placeholder="Send a message… (Enter to send, Shift+Enter for newline)"></textarea>
  <button type="submit" id="send">send</button>
</form>
<script>
const log = document.getElementById('log');
const inp = document.getElementById('inp');
const f = document.getElementById('f');
let messages = [];
fetch('/props').then(r => r.json()).then(p => {
  document.getElementById('model').textContent = p.model + ' · ctx ' + p.n_ctx;
});
document.getElementById('clear').onclick = () => { messages = []; log.innerHTML = ''; };
function bubble(role, text) {
  const d = document.createElement('div');
  d.className = 'msg ' + role;
  d.textContent = text;
  log.appendChild(d);
  log.scrollTop = log.scrollHeight;
  return d;
}
inp.addEventListener('keydown', e => {
  if (e.key === 'Enter' && !e.shiftKey) { e.preventDefault(); f.requestSubmit(); }
});
f.addEventListener('submit', async e => {
  e.preventDefault();
  const text = inp.value.trim();
  if (!text) return;
  inp.value = '';
  bubble('user', text);
  messages.push({role: 'user', content: text});
  const out = bubble('assistant', '');
  document.getElementById('send').disabled = true;
  const t0 = performance.now();
  let ntok = 0;
  try {
    const res = await fetch('/v1/chat/completions', {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({
        messages, stream: true,
        temperature: parseFloat(document.getElementById('temp').value),
        max_tokens: parseInt(document.getElementById('maxtok').value),
      }),
    });
    const rd = res.body.getReader();
    const dec = new TextDecoder();
    let buf = '';
    for (;;) {
      const {done, value} = await rd.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      let i;
      while ((i = buf.indexOf('\\n\\n')) >= 0) {
        const line = buf.slice(0, i).trim();
        buf = buf.slice(i + 2);
        if (!line.startsWith('data: ')) continue;
        const payload = line.slice(6);
        if (payload === '[DONE]') continue;
        const js = JSON.parse(payload);
        const delta = js.choices && js.choices[0].delta && js.choices[0].delta.content;
        if (delta) { out.textContent += delta; ntok++; log.scrollTop = log.scrollHeight; }
      }
    }
  } catch (err) {
    out.textContent += '\\n[error: ' + err + ']';
  }
  const dt = (performance.now() - t0) / 1000;
  const meta = document.createElement('div');
  meta.className = 'meta';
  meta.textContent = ntok + ' chunks in ' + dt.toFixed(1) + 's';
  log.appendChild(meta);
  messages.push({role: 'assistant', content: out.textContent});
  document.getElementById('send').disabled = false;
  inp.focus();
});
</script>
</body>
</html>
"""
