"""OAuth authorization-code consent flow (sources/oauth.py) against a
live fixture token server — BaseOAuth2Flow parity: consent-URL shape
(GithubOAuthFlow.java:59-77), code extraction (:268-274), token POST
in both content types (:41-64, :245-261), refresh_token-required
output (:284-292), credentials masked in the platform payload
(BaseOAuthFlow.java:111-122, MoreOAuthParameters.java:27), and the
bridge into the runtime Oauth2Authenticator."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from airbyte_integrations_spark.sources.oauth import (
    SECRET_MASK,
    OAuthFlowSpec,
    authenticator_from_flow,
    complete_oauth,
    complete_oauth_flow,
    extract_code_parameter,
    flow_spec_from_manifest,
    generate_state,
    get_consent_url,
)

CLIENT_ID = "client-abc"
CLIENT_SECRET = "s3cr3t-value-never-logged"


@pytest.fixture()
def token_server():
    state = {"requests": [], "grant": "ok-code", "omit_refresh": False}

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n).decode()
            ctype = self.headers.get("Content-Type", "")
            if ctype == "application/json":
                body = json.loads(raw)
            else:
                assert ctype == "application/x-www-form-urlencoded"
                body = {k: v[0] for k, v in urllib.parse.parse_qs(raw).items()}
            state["requests"].append({"path": self.path, "ct": ctype, "body": body})
            if self.path == "/token":
                ok = (
                    body.get("client_id") == CLIENT_ID
                    and body.get("client_secret") == CLIENT_SECRET
                    and body.get("code") == state["grant"]
                    and body.get("redirect_uri")
                )
                if not ok:
                    self.send_response(401)
                    self.end_headers()
                    return
                payload = {"access_token": "at-1", "expires_in": 3600,
                           "token_type": "bearer"}
                if not state["omit_refresh"]:
                    payload["refresh_token"] = "rt-1"
            elif self.path == "/refresh":
                assert body.get("grant_type") == "refresh_token"
                assert body.get("refresh_token") == "rt-1"
                assert body.get("client_secret") == CLIENT_SECRET
                payload = {"access_token": "at-2", "expires_in": 3600}
            else:
                self.send_response(404)
                self.end_headers()
                return
            data = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", state
    finally:
        srv.shutdown()


def _spec(base, **kw):
    return OAuthFlowSpec(
        consent_url=base + "/authorize",
        access_token_url=base + "/token",
        client_id=CLIENT_ID,
        client_secret=CLIENT_SECRET,
        scopes=("repo", "read:org"),
        **kw,
    )


def test_consent_url_shape_and_no_secret(token_server):
    base, _ = token_server
    url = get_consent_url(_spec(base), "https://app.example/cb", state="st7x")
    parsed = urllib.parse.urlparse(url)
    q = {k: v[0] for k, v in urllib.parse.parse_qs(parsed.query).items()}
    assert parsed.path == "/authorize"
    assert q == {
        "client_id": CLIENT_ID,
        "redirect_uri": "https://app.example/cb",
        "scope": "repo read:org",
        "state": "st7x",
    }
    # the client SECRET must never ride the consent URL
    assert CLIENT_SECRET not in url
    # auto state: random alphanumeric, present
    auto = get_consent_url(_spec(base), "https://app.example/cb")
    st = urllib.parse.parse_qs(urllib.parse.urlparse(auto).query)["state"][0]
    assert st.isalnum() and len(st) == 7
    # a consent_url that already has a query keeps it
    spec2 = OAuthFlowSpec(
        consent_url=base + "/authorize?audience=api",
        access_token_url=base + "/token",
        client_id=CLIENT_ID, client_secret=CLIENT_SECRET,
    )
    u2 = get_consent_url(spec2, "https://app.example/cb", state="s")
    assert "audience=api&" in u2 and u2.count("?") == 1


def test_code_extraction_requires_code():
    with pytest.raises(ValueError, match="Undefined 'code'"):
        extract_code_parameter({"state": "x"})
    assert extract_code_parameter({"code": "c1", "state": "x"}) == "c1"


@pytest.mark.parametrize("ctype", ["urlencoded", "json"])
def test_handshake_both_content_types(token_server, ctype):
    base, state = token_server
    spec = _spec(base, token_request_content_type=ctype)
    out = complete_oauth_flow(spec, "ok-code", "https://app.example/cb")
    assert out == {"refresh_token": "rt-1"}
    req = state["requests"][-1]
    want_ct = (
        "application/json" if ctype == "json"
        else "application/x-www-form-urlencoded"
    )
    assert req["ct"] == want_ct
    assert req["body"]["redirect_uri"] == "https://app.example/cb"


def test_complete_oauth_masks_server_params(token_server):
    base, _ = token_server
    payload = complete_oauth(
        _spec(base), {"code": "ok-code", "state": "s"}, "https://app.example/cb"
    )
    # nested under the default output path with credentials MASKED
    assert payload == {
        "credentials": {
            "refresh_token": "rt-1",
            "client_id": SECRET_MASK,
            "client_secret": SECRET_MASK,
        }
    }
    assert CLIENT_SECRET not in json.dumps(payload)


def test_complete_oauth_state_verification(token_server):
    """CSRF guard: with expected_state given, a redirect whose state is
    absent or different is rejected BEFORE any token request; the
    matching state completes normally (ADVICE r5: the module docstring
    advertises CSRF protection, so the completion path must offer the
    check)."""
    base, state = token_server
    before = len(state["requests"])
    with pytest.raises(ValueError, match="State mismatch"):
        complete_oauth(
            _spec(base), {"code": "ok-code", "state": "evil"},
            "https://app.example/cb", expected_state="issued",
        )
    with pytest.raises(ValueError, match="State mismatch"):
        complete_oauth(
            _spec(base), {"code": "ok-code"},
            "https://app.example/cb", expected_state="issued",
        )
    assert len(state["requests"]) == before  # rejected pre-handshake
    payload = complete_oauth(
        _spec(base), {"code": "ok-code", "state": "issued"},
        "https://app.example/cb", expected_state="issued",
    )
    assert payload["credentials"]["refresh_token"] == "rt-1"


def test_flow_spec_manifest_missing_token_endpoint_names_field():
    with pytest.raises(ValueError, match="token_refresh_endpoint"):
        flow_spec_from_manifest(
            {"type": "oauth2", "consent_url": "https://x/authorize",
             "client_id": "a", "client_secret": "b"},
            {},
        )


def test_missing_refresh_token_fails_without_leaking(token_server):
    base, state = token_server
    state["omit_refresh"] = True
    with pytest.raises(ValueError, match="Missing 'refresh_token'") as ei:
        complete_oauth_flow(_spec(base), "ok-code", "https://app.example/cb")
    assert CLIENT_SECRET not in str(ei.value)
    state["omit_refresh"] = False
    # provider rejection: endpoint + exception type only, no body echo
    with pytest.raises(ValueError, match="HTTPError") as ei2:
        complete_oauth_flow(_spec(base), "WRONG-code", "https://app.example/cb")
    assert CLIENT_SECRET not in str(ei2.value)


def test_authenticator_bridge_refreshes_live(token_server):
    base, state = token_server
    spec = _spec(base)
    payload = complete_oauth(
        spec, {"code": "ok-code"}, "https://app.example/cb"
    )
    auth = authenticator_from_flow(
        spec, payload, token_refresh_endpoint=base + "/refresh"
    )
    assert auth.get_auth_header() == {"Authorization": "Bearer at-2"}
    # one refresh; the cached token is reused until expiry
    assert auth.get_auth_header() == {"Authorization": "Bearer at-2"}
    assert sum(r["path"] == "/refresh" for r in state["requests"]) == 1


def test_flow_spec_from_manifest_interpolates(token_server):
    base, _ = token_server
    block = {
        "type": "oauth2",
        "consent_url": base + "/authorize",
        "token_refresh_endpoint": base + "/token",
        "client_id": "{{ config.client_id }}",
        "client_secret": "{{ config.client_secret }}",
        "scopes": ["repo"],
        "token_request_content_type": "json",
    }
    cfg = {"client_id": CLIENT_ID, "client_secret": CLIENT_SECRET}
    spec = flow_spec_from_manifest(block, cfg)
    assert spec.client_id == CLIENT_ID
    assert spec.client_secret == CLIENT_SECRET
    assert spec.token_request_content_type == "json"
    out = complete_oauth_flow(spec, "ok-code", "https://app.example/cb")
    assert out == {"refresh_token": "rt-1"}
    with pytest.raises(ValueError, match="oauth2"):
        flow_spec_from_manifest({"type": "token"}, cfg)
    with pytest.raises(ValueError, match="consent_url"):
        flow_spec_from_manifest(
            {k: v for k, v in block.items() if k != "consent_url"}, cfg
        )


def test_generate_state_is_alnum_and_varies():
    vals = {generate_state() for _ in range(20)}
    assert all(v.isalnum() and len(v) == 7 for v in vals)
    assert len(vals) > 1
