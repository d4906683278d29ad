/* smelter_dtls: minimal DTLS-SRTP endpoint over OpenSSL 3 (libssl.so.3).
 *
 * The TPU-stack building block for WHIP/WHEP WebRTC transport (the reference
 * uses webrtc-rs; here the handshake runs in native code and the datagram
 * transport/ICE lives in Python, which owns the muxed UDP socket).
 *
 * No OpenSSL headers are available in this image, so the needed ABI surface
 * is declared locally (the OpenSSL 3 ABI is stable). Link: libssl.so.3 +
 * libcrypto.so.3.
 *
 * API (C ABI, see python wrapper smelter_tpu/io/webrtc/dtls.py):
 *   sm_dtls_new(is_server)      -> handle (generates a self-signed cert)
 *   sm_dtls_fingerprint(h, buf) -> "sha-256 AB:CD:..." of the local cert
 *   sm_dtls_do_handshake(h, in, in_len, out, out_cap) -> bytes to send
 *   sm_dtls_is_established(h)
 *   sm_dtls_export_srtp_keys(h, buf60)  (AES_CM_128_HMAC_SHA1_80 material)
 *   sm_dtls_close(h)
 */

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>

extern "C" {

/* ---- minimal OpenSSL 3 ABI declarations ---- */
typedef struct ssl_ctx_st SSL_CTX;
typedef struct ssl_st SSL;
typedef struct ssl_method_st SSL_METHOD;
typedef struct bio_st BIO;
typedef struct bio_method_st BIO_METHOD;
typedef struct evp_pkey_st EVP_PKEY;
typedef struct evp_pkey_ctx_st EVP_PKEY_CTX;
typedef struct x509_st X509;
typedef struct X509_name_st X509_NAME;
typedef struct asn1_time_st ASN1_TIME;
typedef struct evp_md_st EVP_MD;

const SSL_METHOD *DTLS_method(void);
SSL_CTX *SSL_CTX_new(const SSL_METHOD *);
void SSL_CTX_free(SSL_CTX *);
int SSL_CTX_use_certificate(SSL_CTX *, X509 *);
int SSL_CTX_use_PrivateKey(SSL_CTX *, EVP_PKEY *);
int SSL_CTX_set_tlsext_use_srtp(SSL_CTX *, const char *);
void SSL_CTX_set_verify(SSL_CTX *, int, void *);
long SSL_CTX_ctrl(SSL_CTX *, int, long, void *);
SSL *SSL_new(SSL_CTX *);
void SSL_free(SSL *);
void SSL_set_accept_state(SSL *);
void SSL_set_connect_state(SSL *);
void SSL_set_bio(SSL *, BIO *, BIO *);
int SSL_do_handshake(SSL *);
int SSL_get_error(const SSL *, int);
int SSL_is_init_finished(const SSL *);
int SSL_export_keying_material(SSL *, unsigned char *, size_t, const char *,
                               size_t, const unsigned char *, size_t, int);
int SSL_read(SSL *, void *, int);
int SSL_write(SSL *, const void *, int);

const BIO_METHOD *BIO_s_mem(void);
BIO *BIO_new(const BIO_METHOD *);
int BIO_write(BIO *, const void *, int);
int BIO_read(BIO *, void *, int);
long BIO_ctrl(BIO *, int, long, void *);
size_t BIO_ctrl_pending(BIO *);

EVP_PKEY *EVP_PKEY_Q_keygen(void *libctx, const char *propq, const char *type, ...);
void EVP_PKEY_free(EVP_PKEY *);

X509 *X509_new(void);
void X509_free(X509 *);
int X509_set_version(X509 *, long);
struct asn1_string_st *X509_get_serialNumber(X509 *);
int ASN1_INTEGER_set(void *, long);
ASN1_TIME *X509_getm_notBefore(const X509 *);
ASN1_TIME *X509_getm_notAfter(const X509 *);
ASN1_TIME *X509_gmtime_adj(ASN1_TIME *, long);
int X509_set_pubkey(X509 *, EVP_PKEY *);
X509_NAME *X509_get_subject_name(const X509 *);
int X509_NAME_add_entry_by_txt(X509_NAME *, const char *, int,
                               const unsigned char *, int, int, int);
int X509_set_issuer_name(X509 *, X509_NAME *);
int X509_sign(X509 *, EVP_PKEY *, const EVP_MD *);
int X509_digest(const X509 *, const EVP_MD *, unsigned char *, unsigned int *);
const EVP_MD *EVP_sha256(void);

unsigned long ERR_get_error(void);
void ERR_error_string_n(unsigned long, char *, size_t);

} /* extern "C" */

#define SSL_ERROR_WANT_READ 2
#define SSL_VERIFY_NONE 0
#define MBSTRING_ASC 0x1001
#define BIO_C_SET_BUF_MEM_EOF_RETURN 130

namespace {

struct Endpoint {
    SSL_CTX *ctx = nullptr;
    SSL *ssl = nullptr;
    BIO *rbio = nullptr;  /* network -> ssl */
    BIO *wbio = nullptr;  /* ssl -> network */
    EVP_PKEY *key = nullptr;
    X509 *cert = nullptr;
    bool server = false;

    ~Endpoint() {
        if (ssl) SSL_free(ssl);  /* frees the BIOs */
        if (ctx) SSL_CTX_free(ctx);
        if (cert) X509_free(cert);
        if (key) EVP_PKEY_free(key);
    }
};

std::mutex g_mu;
std::unordered_map<int, std::unique_ptr<Endpoint>> g_eps;
int g_next = 1;
thread_local std::string g_err;

int fail(const char *what) {
    char buf[256];
    unsigned long e = ERR_get_error();
    if (e) {
        ERR_error_string_n(e, buf, sizeof(buf));
        g_err = std::string(what) + ": " + buf;
    } else {
        g_err = what;
    }
    return -2;
}

Endpoint *get(int h) {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_eps.find(h);
    return it == g_eps.end() ? nullptr : it->second.get();
}

bool make_self_signed(Endpoint *ep) {
    ep->key = EVP_PKEY_Q_keygen(nullptr, nullptr, "EC", "P-256");
    if (!ep->key) return false;
    ep->cert = X509_new();
    if (!ep->cert) return false;
    X509_set_version(ep->cert, 2);
    ASN1_INTEGER_set(X509_get_serialNumber(ep->cert), (long)0x5eed);
    X509_gmtime_adj(X509_getm_notBefore(ep->cert), -3600L);
    X509_gmtime_adj(X509_getm_notAfter(ep->cert), 86400L * 365);
    X509_set_pubkey(ep->cert, ep->key);
    X509_NAME *name = X509_get_subject_name(ep->cert);
    X509_NAME_add_entry_by_txt(
        name, "CN", MBSTRING_ASC,
        (const unsigned char *)"smelter-tpu", -1, -1, 0);
    X509_set_issuer_name(ep->cert, name);
    if (X509_sign(ep->cert, ep->key, EVP_sha256()) <= 0) return false;
    return true;
}

} // namespace

extern "C" {

const char *sm_dtls_last_error(void) { return g_err.c_str(); }

int sm_dtls_new(int is_server) {
    auto ep = std::make_unique<Endpoint>();
    ep->server = is_server != 0;
    if (!make_self_signed(ep.get())) return fail("self-signed cert");
    ep->ctx = SSL_CTX_new(DTLS_method());
    if (!ep->ctx) return fail("SSL_CTX_new");
    if (SSL_CTX_use_certificate(ep->ctx, ep->cert) != 1)
        return fail("use_certificate");
    if (SSL_CTX_use_PrivateKey(ep->ctx, ep->key) != 1)
        return fail("use_privatekey");
    if (SSL_CTX_set_tlsext_use_srtp(ep->ctx, "SRTP_AES128_CM_SHA1_80") != 0)
        return fail("set_tlsext_use_srtp");
    SSL_CTX_set_verify(ep->ctx, SSL_VERIFY_NONE, nullptr);
    ep->ssl = SSL_new(ep->ctx);
    if (!ep->ssl) return fail("SSL_new");
    ep->rbio = BIO_new(BIO_s_mem());
    ep->wbio = BIO_new(BIO_s_mem());
    BIO_ctrl(ep->rbio, BIO_C_SET_BUF_MEM_EOF_RETURN, -1, nullptr);
    BIO_ctrl(ep->wbio, BIO_C_SET_BUF_MEM_EOF_RETURN, -1, nullptr);
    SSL_set_bio(ep->ssl, ep->rbio, ep->wbio);
    if (ep->server)
        SSL_set_accept_state(ep->ssl);
    else
        SSL_set_connect_state(ep->ssl);
    std::lock_guard<std::mutex> lk(g_mu);
    int h = g_next++;
    g_eps[h] = std::move(ep);
    return h;
}

/* "AB:CD:..." sha-256 fingerprint of the local cert. Returns length. */
int sm_dtls_fingerprint(int h, char *buf, int cap) {
    Endpoint *ep = get(h);
    if (!ep) return fail("bad handle");
    unsigned char md[32];
    unsigned int n = 0;
    if (X509_digest(ep->cert, EVP_sha256(), md, &n) != 1)
        return fail("digest");
    if ((int)(n * 3) > cap) return fail("buffer too small");
    int pos = 0;
    for (unsigned int i = 0; i < n; i++) {
        pos += snprintf(buf + pos, cap - pos, i ? ":%02X" : "%02X", md[i]);
    }
    return pos;
}

/* Feed an incoming datagram (may be empty) and step the handshake.
 * Outgoing flight (if any) is written to out. Returns out length (>=0) or
 * -2 on error. */
int sm_dtls_do_handshake(int h, const uint8_t *in, int in_len,
                         uint8_t *out, int out_cap) {
    Endpoint *ep = get(h);
    if (!ep) return fail("bad handle");
    if (in && in_len > 0) {
        if (BIO_write(ep->rbio, in, in_len) != in_len)
            return fail("BIO_write");
    }
    int rc = SSL_do_handshake(ep->ssl);
    if (rc != 1) {
        int err = SSL_get_error(ep->ssl, rc);
        if (err != SSL_ERROR_WANT_READ && err != 3 /* WANT_WRITE */)
            return fail("handshake");
    }
    size_t pending = BIO_ctrl_pending(ep->wbio);
    if ((int)pending > out_cap) return fail("out buffer too small");
    int n = pending ? BIO_read(ep->wbio, out, (int)pending) : 0;
    return n < 0 ? 0 : n;
}

int sm_dtls_is_established(int h) {
    Endpoint *ep = get(h);
    if (!ep) return fail("bad handle");
    return SSL_is_init_finished(ep->ssl) ? 1 : 0;
}

/* 60 bytes: client_key(16) server_key(16) client_salt(14) server_salt(14)
 * per RFC 5764 for SRTP_AES128_CM_SHA1_80. */
int sm_dtls_export_srtp_keys(int h, uint8_t *buf60) {
    Endpoint *ep = get(h);
    if (!ep) return fail("bad handle");
    unsigned char material[60];
    if (SSL_export_keying_material(ep->ssl, material, sizeof(material),
                                   "EXTRACTOR-dtls_srtp", 19, nullptr, 0,
                                   0) != 1)
        return fail("export_keying_material");
    memcpy(buf60, material, 60);
    return 60;
}

int sm_dtls_close(int h) {
    std::lock_guard<std::mutex> lk(g_mu);
    return g_eps.erase(h) ? 0 : -1;
}

} /* extern "C" */
