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




@cli.command()
@click.option("--output", type=click.Path(), default="./dist")
@click.option("--bundle-version", default=None)
@click.option("--nightly/--no-nightly", default=False)
@click.option("--tar-zst/--no-tar-zst", default=True)
@click.option("--tar-zst-level", default=12, type=int)
def bundle(output, bundle_version, nightly, tar_zst, tar_zst_level):
    """Pack the source tree into a versioned .tar.zst bundle
    (reference src/__main__.py:506)."""
    from apex_studio_tpu.distribution import build_bundle

    root = Path(__file__).resolve().parent.parent
    version = bundle_version or os.environ.get("APEX_BUNDLE_VERSION") or __version__
    artifact = build_bundle(root, Path(output), version, nightly=nightly,
                            tar_zst=tar_zst, tar_zst_level=tar_zst_level)
    click.echo(str(artifact))


@cli.command()
@click.argument("artifact", type=click.Path(exists=True))
@click.option("--repo", required=True, help="HF repo id, e.g. org/apex-releases")
@click.option("--revision", default="main")
def publish(artifact, repo, revision):
    """Upload a bundle artifact to a HuggingFace releases repo
    (reference src/__main__.py:677)."""
    from apex_studio_tpu.distribution import publish as _publish

    url = _publish(Path(artifact), repo, revision=revision)
    click.echo(url)


@cli.command(name="check-updates")
@click.option("--repo", required=True)
@click.option("--target-dir", type=click.Path(), default=None)
def check_updates(repo, target_dir):
    """List newer compatible release assets (reference src/__main__.py:1567)."""
    from apex_studio_tpu.distribution import (
        installed_version, list_remote_assets, pick_update)

    target = Path(target_dir) if target_dir else Path(__file__).resolve().parent.parent
    current = installed_version(target)
    assets = list_remote_assets(repo)
    best = pick_update(assets, current)
    if best is None:
        click.echo(json.dumps({"current": current, "update": None}))
    else:
        click.echo(json.dumps({"current": current, "update": best.version,
                               "url": best.url}))


@cli.command()
@click.option("--repo", default=None, help="HF releases repo to pull from")
@click.option("--archive", type=click.Path(exists=True), default=None,
              help="Apply a local bundle archive instead of downloading")
@click.option("--target-dir", type=click.Path(), default=None)
def update(repo, archive, target_dir):
    """Self-update from a releases repo or a local archive
    (reference src/__main__.py update asset machinery)."""
    from apex_studio_tpu.distribution import (
        apply_update, installed_version, list_remote_assets, pick_update)

    target = Path(target_dir) if target_dir else Path(__file__).resolve().parent.parent
    if archive is None:
        if repo is None:
            raise click.UsageError("--repo or --archive required")
        current = installed_version(target)
        best = pick_update(list_remote_assets(repo), current)
        if best is None:
            click.echo("already up to date")
            return
        import requests

        dest = home_dir() / "updates" / best.name
        dest.parent.mkdir(parents=True, exist_ok=True)
        with requests.get(best.url, stream=True, timeout=600) as r:
            r.raise_for_status()
            with open(dest, "wb") as f:
                for chunk in r.iter_content(1 << 20):
                    f.write(chunk)
        archive = dest
    manifest = apply_update(Path(archive), target)
    click.echo(json.dumps({"updated_to": manifest["version"],
                           "files": len(manifest["files"])}))

if __name__ == "__main__":
    cli()
