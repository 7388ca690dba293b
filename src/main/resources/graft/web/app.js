// graft web UI — plain browser JS over the /api/* surface. No external
// libraries: fetch() for transport and a small escape-first markdown
// renderer below (the engine's analysis markdown uses only headings,
// bold, code fences, lists and tables).
(function () {
  'use strict';

  var $ = function (id) { return document.getElementById(id); };

  // ---- markdown rendering (escape first, then structure) --------------

  function escapeHtml(s) {
    return s.replace(/&/g, '&amp;').replace(/</g, '&lt;').replace(/>/g, '&gt;')
      .replace(/"/g, '&quot;');
  }

  function inline(s) { // on already-escaped text
    return s
      .replace(/\*\*([^*]+)\*\*/g, '<strong>$1</strong>')
      .replace(/`([^`]+)`/g, '<code>$1</code>');
  }

  function renderBlock(text) {
    var lines = text.split('\n');
    var html = '', i = 0;
    while (i < lines.length) {
      var ln = lines[i];
      if (/^### /.test(ln)) { html += '<h3>' + inline(escapeHtml(ln.slice(4))) + '</h3>'; i++; }
      else if (/^## /.test(ln)) { html += '<h2>' + inline(escapeHtml(ln.slice(3))) + '</h2>'; i++; }
      else if (/^\|/.test(ln)) {
        var rows = [];
        while (i < lines.length && /^\|/.test(lines[i])) { rows.push(lines[i]); i++; }
        html += renderTable(rows);
      }
      else if (/^- /.test(ln)) {
        html += '<ul>';
        while (i < lines.length && /^- /.test(lines[i])) {
          html += '<li>' + inline(escapeHtml(lines[i].slice(2))) + '</li>'; i++;
        }
        html += '</ul>';
      }
      else if (ln.trim() === '') { i++; }
      else { html += '<p>' + inline(escapeHtml(ln)) + '</p>'; i++; }
    }
    return html;
  }

  function renderTable(rows) {
    var html = '<table>';
    for (var r = 0; r < rows.length; r++) {
      var cells = rows[r].replace(/^\|/, '').replace(/\|\s*$/, '').split('|');
      if (cells.every(function (c) { return /^\s*:?-+:?\s*$/.test(c); })) continue;
      var tag = r === 0 ? 'th' : 'td';
      html += '<tr>' + cells.map(function (c) {
        return '<' + tag + '>' + inline(escapeHtml(c.trim())) + '</' + tag + '>';
      }).join('') + '</tr>';
    }
    return html + '</table>';
  }

  function renderMarkdown(md) {
    // fence-split: even chunks are prose, odd chunks are code blocks
    var parts = md.split('```');
    var html = '';
    for (var i = 0; i < parts.length; i++) {
      if (i % 2 === 1) {
        var code = parts[i];
        var nl = code.indexOf('\n');
        var lang = nl >= 0 ? code.slice(0, nl).trim() : '';
        if (nl >= 0) code = code.slice(nl + 1);
        html += '<pre><code class="lang-' + escapeHtml(lang) + '">'
          + escapeHtml(code) + '</code></pre>';
      } else html += renderBlock(parts[i]);
    }
    return html;
  }

  // ---- transport ------------------------------------------------------

  function getJson(url) {
    return fetch(url).then(function (r) { return r.json(); });
  }
  function postJson(url, body) {
    return fetch(url, {
      method: 'POST',
      headers: body ? { 'Content-Type': 'application/json' } : {},
      body: body ? JSON.stringify(body) : null
    }).then(function (r) { return r.json(); });
  }

  // ---- messages -------------------------------------------------------

  function addMessage(who, cssClass, html) {
    var div = document.createElement('div');
    div.className = 'msg ' + cssClass;
    var label = document.createElement('div');
    label.className = 'who';
    label.textContent = who;
    var body = document.createElement('div');
    body.className = 'md';
    body.innerHTML = html;
    div.appendChild(label);
    div.appendChild(body);
    $('messages').appendChild(div);
    $('messages').scrollTop = $('messages').scrollHeight;
  }

  function showError(msg) { $('errorBox').textContent = msg || ''; }

  // ---- sessions + history ---------------------------------------------

  function loadSessions() {
    getJson('/api/sessions').then(function (d) {
      var box = $('sessionList');
      box.innerHTML = '';
      (d.sessions || []).forEach(function (s) {
        var el = document.createElement('div');
        el.className = 'item';
        el.textContent = s.session_id.slice(0, 8) + ' · ' + s.n_chats + ' chats · '
          + s.n_files + ' files';
        el.title = s.session_id;
        el.onclick = function () {
          postJson('/api/switch_session/' + s.session_id).then(function () {
            $('messages').innerHTML = '';
            refresh();
          });
        };
        box.appendChild(el);
      });
    });
  }

  function loadHistory() {
    getJson('/api/chat_history').then(function (d) {
      var box = $('chatHistory');
      box.innerHTML = '';
      (d.history || []).forEach(function (h) {
        var el = document.createElement('div');
        el.className = 'item';
        el.textContent = h.question;
        el.title = h.question;
        el.onclick = function () {
          addMessage('you', 'user', '<p>' + escapeHtml(h.question) + '</p>');
          addMessage('graft', '', renderMarkdown(h.markdown_result));
        };
        box.appendChild(el);
      });
    });
  }

  function loadFiles() {
    return getJson('/api/files').then(function (d) {
      var sel = $('fileSelect');
      var keep = sel.value;
      sel.innerHTML = '<option value="">— choose an uploaded file —</option>';
      (d.files || []).forEach(function (f) {
        var opt = document.createElement('option');
        opt.value = f.file_id;
        opt.textContent = f.filename;
        sel.appendChild(opt);
      });
      sel.value = keep;
    });
  }

  function refresh() { loadSessions(); loadFiles(); loadHistory(); }

  // ---- upload ---------------------------------------------------------

  function uploadFile(file) {
    showError('');
    $('dropArea').textContent = 'uploading ' + file.name + ' …';
    var fd = new FormData();
    fd.append('file', file);
    fetch('/api/upload', { method: 'POST', body: fd })
      .then(function (r) { return r.json(); })
      .then(function (d) {
        if (d.error) { showError(d.error); $('dropArea').textContent = 'click or drop a file to upload'; return; }
        $('dropArea').textContent = d.filename + ' uploaded';
        loadSessions();
        // select the new file only after the options exist — a timer
        // would race the fetch and silently no-op on a slow server
        loadFiles().then(function () { $('fileSelect').value = d.file_id; });
      })
      .catch(function (e) { showError(String(e)); });
  }

  // ---- ask ------------------------------------------------------------

  function ask() {
    var fileId = $('fileSelect').value;
    var q = $('questionInput').value.trim();
    if (!fileId) { showError('choose an uploaded file first'); return; }
    if (!q) { showError('enter a question'); return; }
    showError('');
    $('submitBtn').disabled = true;
    addMessage('you', 'user', '<p>' + escapeHtml(q) + '</p>');
    postJson('/api/ask_question', { file_id: fileId, question: q })
      .then(function (d) {
        $('submitBtn').disabled = false;
        if (d.error) { showError(d.error); return; }
        addMessage('graft', '', renderMarkdown(d.markdown_result));
        // server-rendered auto-chart (labels are XML-escaped server-side;
        // the SVG is generated by our own server, never by the model)
        if (d.chart_svg) { addMessage('graft', 'chart', d.chart_svg); }
        $('questionInput').value = '';
        loadHistory();
      })
      .catch(function (e) { $('submitBtn').disabled = false; showError(String(e)); });
  }

  // ---- wiring ---------------------------------------------------------

  document.addEventListener('DOMContentLoaded', function () {
    $('dropArea').onclick = function () { $('fileInput').click(); };
    $('fileInput').onchange = function () {
      if (this.files.length) uploadFile(this.files[0]);
    };
    $('dropArea').ondragover = function (e) { e.preventDefault(); this.classList.add('over'); };
    $('dropArea').ondragleave = function () { this.classList.remove('over'); };
    $('dropArea').ondrop = function (e) {
      e.preventDefault(); this.classList.remove('over');
      if (e.dataTransfer.files.length) uploadFile(e.dataTransfer.files[0]);
    };
    $('askForm').onsubmit = function (e) { e.preventDefault(); ask(); };
    $('newSessionBtn').onclick = function () {
      postJson('/api/new_session').then(function () {
        $('messages').innerHTML = '';
        refresh();
      });
    };
    refresh();
  });
})();
