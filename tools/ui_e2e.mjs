// Dev-only browser-less e2e of the web UI: drives upload -> ask ->
// render against a running server, executing the REAL client script
// (app.js) in a Node vm with a stubbed DOM to exercise its markdown
// renderer on real engine output, plus a hostile-markdown XSS probe.
//
// Usage:
//   sbt 'runMain graft.engine.WebMain 8642 /tmp/graft-webui' &
//   node tools/ui_e2e.mjs [base-url]
//
// The shipped library has no Node dependency — this is a dev check,
// like check_oracle.py.
import vm from 'node:vm';
const base = process.argv[2] || 'http://127.0.0.1:8642';

// 1. page + script serve
const html = await (await fetch(base + '/')).text();
for (const id of ['dropArea','fileSelect','questionInput','askForm','chatHistory','sessionList'])
  if (!html.includes(`id="${id}"`)) throw new Error('missing ' + id);
let js = await (await fetch(base + '/static/app.js')).text();

// 2. extract the renderer from the real script (expose via test hook)
js = js.replace("document.addEventListener('DOMContentLoaded'",
  "globalThis.__g = { renderMarkdown: renderMarkdown, escapeHtml: escapeHtml };\n  document.addEventListener('DOMContentLoaded'");
const sandbox = { document: { getElementById: () => ({}), addEventListener: () => {}, createElement: () => ({}) }, fetch: () => new Promise(() => {}), setTimeout, console, globalThis: {} };
sandbox.globalThis = sandbox;
vm.createContext(sandbox);
vm.runInContext(js, sandbox);
const { renderMarkdown } = sandbox.__g;

// 3. real upload -> ask flow with cookie
import fs from 'node:fs';
const csv = fs.readFileSync('/root/repo/src/test/resources/sample_sales_data.csv');
const fd = new FormData();
fd.append('file', new Blob([csv]), 'sample_sales_data.csv');
const up = await fetch(base + '/api/upload', { method: 'POST', body: fd });
const cookie = (up.headers.get('set-cookie') || '').split(';')[0];
const upj = await up.json();
if (!upj.file_id) throw new Error('upload failed: ' + JSON.stringify(upj));

const ask = await fetch(base + '/api/ask_question', {
  method: 'POST',
  headers: { 'Content-Type': 'application/json', 'Cookie': cookie },
  body: JSON.stringify({ file_id: upj.file_id, question: 'which city has the highest revenue?' })
});
const askj = await ask.json();
if (!askj.markdown_result) throw new Error('ask failed: ' + JSON.stringify(askj));

// 4. render the REAL engine markdown through the REAL client renderer
const out = renderMarkdown(askj.markdown_result);
const checks = [
  ['<h2>', 'heading h2'], ['<h3>', 'heading h3'],
  ['<pre><code class="lang-sql">', 'sql fence'],
  ['<table>', 'table'], ['<th>', 'table header'], ['<strong>', 'bold'],
];
for (const [frag, name] of checks)
  if (!out.includes(frag)) throw new Error('rendered output missing ' + name + '\n' + out.slice(0, 600));
if (out.includes('<script') ) throw new Error('unescaped script!');
// XSS probe: hostile markdown must come out inert
const hostile = renderMarkdown('## hi <script>alert(1)</script>\n| a | <img onerror=x> |\n| - | - |\n');
if (hostile.includes('<script>') || hostile.includes('<img')) throw new Error('XSS: ' + hostile);
// auto-chart: the city-revenue result is the classic label+measure
// shape, so the server must attach a rendered SVG bar chart
if (!askj.chart_svg) throw new Error('chart_svg missing: ' + Object.keys(askj));
if (!askj.chart_svg.startsWith('<svg') || !askj.chart_svg.includes('<rect'))
  throw new Error('chart_svg is not an svg bar chart: ' + askj.chart_svg.slice(0, 120));
if (askj.chart_svg.includes('<script')) throw new Error('chart XSS!');
// history renders too
const hist = await (await fetch(base + '/api/chat_history', { headers: { Cookie: cookie } })).json();
if (!hist.history.length) throw new Error('history empty');
console.log('UI E2E PASS — rendered', out.length, 'chars;', hist.history.length,
  'history item(s); chart', askj.chart_svg.length, 'chars');
console.log(out.slice(0, 400));
