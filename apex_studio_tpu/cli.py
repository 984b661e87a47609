"""apex-engine CLI (counterpart of src/__main__.py in the reference, on click).

Commands: start | stop | dev | internal_serve | status | version.
`start` daemonizes internal_serve and waits for /ready; `stop` posts /shutdown.
Bundle/publish/self-update (the reference's frozen-build distribution) are out
of scope for a source deployment and intentionally not reimplemented yet.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import click

from apex_studio_tpu import __version__
from apex_studio_tpu.utils.defaults import DEFAULT_HOST, DEFAULT_PORT, home_dir


def _pid_file() -> Path:
    return home_dir() / "apex-engine.pid"


def _base_url(host: str, port: int) -> str:
    return f"http://{host}:{port}"


@click.group()
def cli() -> None:
    """apex-engine: TPU-native Apex Studio inference server."""


@cli.command()
def version() -> None:
    click.echo(__version__)


@cli.command()
@click.option("--host", default=DEFAULT_HOST)
@click.option("--port", default=DEFAULT_PORT, type=int)
def internal_serve(host: str, port: int) -> None:
    """Run the server in the foreground (what `start` spawns)."""
    from apex_studio_tpu.server.app import serve

    serve(host=host, port=port)


@cli.command()
@click.option("--host", default=DEFAULT_HOST)
@click.option("--port", default=DEFAULT_PORT, type=int)
@click.option("--timeout", default=120.0, type=float, help="seconds to wait for /ready")
def start(host: str, port: int, timeout: float) -> None:
    """Start the server as a background process and wait until ready."""
    import requests

    url = _base_url(host, port)
    try:
        if requests.get(url + "/health", timeout=2).ok:
            click.echo(f"already running at {url}")
            return
    except requests.RequestException:
        pass

    log_path = home_dir() / "apex-engine.log"
    log_path.parent.mkdir(parents=True, exist_ok=True)
    with open(log_path, "ab") as log:
        proc = subprocess.Popen(
            [sys.executable, "-m", "apex_studio_tpu.cli", "internal_serve",
             "--host", host, "--port", str(port)],
            stdout=log,
            stderr=log,
            start_new_session=True,
        )
    _pid_file().parent.mkdir(parents=True, exist_ok=True)
    _pid_file().write_text(str(proc.pid))

    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            r = requests.get(url + "/ready", timeout=2)
            if r.ok and r.json().get("ready"):
                click.echo(f"ready at {url} (pid {proc.pid})")
                return
        except requests.RequestException:
            pass
        if proc.poll() is not None:
            raise click.ClickException(
                f"server exited early (code {proc.returncode}); see {log_path}"
            )
        time.sleep(0.5)
    raise click.ClickException(f"server did not become ready within {timeout}s")


@cli.command()
@click.option("--host", default=DEFAULT_HOST)
@click.option("--port", default=DEFAULT_PORT, type=int)
def stop(host: str, port: int) -> None:
    import requests

    try:
        requests.post(_base_url(host, port) + "/shutdown", timeout=5)
        click.echo("shutdown requested")
        return
    except requests.RequestException:
        pass
    pid_file = _pid_file()
    if pid_file.exists():
        pid = int(pid_file.read_text())
        try:
            os.kill(pid, signal.SIGTERM)
            click.echo(f"killed pid {pid}")
        except ProcessLookupError:
            click.echo("not running")
        pid_file.unlink(missing_ok=True)
    else:
        click.echo("not running")


@cli.command()
@click.option("--host", default=DEFAULT_HOST)
@click.option("--port", default=DEFAULT_PORT, type=int)
def status(host: str, port: int) -> None:
    import requests

    try:
        r = requests.get(_base_url(host, port) + "/ready", timeout=2)
        click.echo(json.dumps(r.json()))
    except requests.RequestException:
        click.echo(json.dumps({"ready": False, "running": False}))


@cli.command()
@click.option("--host", default=DEFAULT_HOST)
@click.option("--port", default=DEFAULT_PORT, type=int)
def dev(host: str, port: int) -> None:
    """Foreground serve with debug logging."""
    import logging

    logging.basicConfig(level=logging.DEBUG)
    from apex_studio_tpu.server.app import serve

    serve(host=host, port=port)


if __name__ == "__main__":
    cli()
