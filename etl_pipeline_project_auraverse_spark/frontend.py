"""Static browser client for the serving shim — behavioral equivalent
of the reference's ``frontend/index.html`` + ``frontend/table.js``
(upload form → POST /run-etl → rendered table + schema pretty-print →
CSV download link; table.js:16-82).

Served by :mod:`server` at ``GET /`` and ``GET /table.js``. Written
fresh against the reference's observable behavior: the form posts the
file as multipart field ``inputFile``; a success response renders
``table`` rows keyed off the first row's keys and pretty-prints
``schema``; an error response shows ``error``. URLs are relative so
the page works on whatever port the server bound (the reference
hard-codes ``localhost:5001``).
"""

from __future__ import annotations

INDEX_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
  <meta charset="UTF-8" />
  <meta name="viewport" content="width=device-width, initial-scale=1" />
  <title>ETL Pipeline Dashboard</title>
  <style>
    body { font-family: sans-serif; margin: 2rem auto; max-width: 960px; }
    table { border-collapse: collapse; margin-top: 1rem; }
    th, td { border: 1px solid #ccc; padding: 4px 10px; text-align: left; }
    pre { background: #f8f8fc; padding: 18px; border-radius: 8px;
          max-height: 500px; overflow: auto; }
    .error { color: #d02927; font-weight: bold; }
  </style>
</head>
<body>
  <h1>ETL Pipeline Table Viewer</h1>
  <form id="etlForm">
    <input type="file" id="uploadInput" name="inputFile" />
    <button type="submit" id="runEtlBtn">Run ETL</button>
  </form>
  <div id="loading" style="display:none;">Processing, please wait...</div>
  <div id="output"></div>
  <div id="schemaContainer" style="margin-top:25px;"></div>
  <button onclick="window.location.href='download'">Download Table as CSV</button>
  <script src="table.js"></script>
</body>
</html>
"""

TABLE_JS = """document.addEventListener('DOMContentLoaded', () => {
  const form = document.getElementById('etlForm');
  const input = document.getElementById('uploadInput');
  const loading = document.getElementById('loading');
  const output = document.getElementById('output');
  const schemaContainer = document.getElementById('schemaContainer');

  form.addEventListener('submit', (ev) => {
    ev.preventDefault();
    output.innerHTML = '';
    schemaContainer.innerHTML = '';
    loading.style.display = 'block';

    const fd = new FormData();
    if (input.files.length) fd.append('inputFile', input.files[0]);

    fetch('run-etl', { method: 'POST', body: fd })
      .then((res) => res.json())
      .then((data) => {
        loading.style.display = 'none';
        if (data.success && data.table && data.table.length) {
          renderTable(data.table);
          renderSchema(data.schema || null);
        } else {
          showError(data.error || 'No data returned.');
        }
      })
      .catch(() => {
        loading.style.display = 'none';
        showError('Network or server error. Ensure backend is running.');
      });
  });

  function esc(s) {
    const d = document.createElement('div');
    d.textContent = String(s);
    return d.innerHTML;
  }

  function showError(msg) {
    output.innerHTML = '<div class="error">Error: ' + esc(msg) + '</div>';
  }

  function renderTable(rows) {
    let html = '<table><thead><tr>';
    html += Object.keys(rows[0]).map((k) => '<th>' + esc(k) + '</th>').join('');
    html += '</tr></thead><tbody>';
    rows.forEach((row) => {
      html += '<tr>' + Object.values(row)
        .map((v) => '<td>' + esc(v ?? '') + '</td>').join('') + '</tr>';
    });
    html += '</tbody></table>';
    output.innerHTML = html;
  }

  function renderSchema(schema) {
    if (!schema) return;
    schemaContainer.innerHTML =
      '<h2>Detected Schema</h2><pre>' +
      esc(JSON.stringify(schema, null, 2)) + '</pre>';
  }
});
"""
