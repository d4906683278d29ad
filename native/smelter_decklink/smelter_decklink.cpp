/* smelter_decklink: DeckLink SDI capture shim (reference `decklink/cpp/`).
 *
 * The DeckLink vendor SDK is not present in this image, so this shim keeps
 * the same C ABI shape the capture input expects (enumerate / open /
 * callback-driven frames) and reports zero devices. On a machine with the
 * SDK installed, implement the bodies against DeckLinkAPI.h — the Python
 * side (smelter_tpu/io/decklink.py) stays unchanged.
 */
#include <cstdint>
#include <cstring>

extern "C" {

typedef struct {
    char name[64];
    char persistent_id[32];
    int32_t subdevice_index;
} sm_decklink_device;

/* Fills up to cap devices; returns the count (0 without the vendor SDK). */
int sm_decklink_enumerate(sm_decklink_device *out, int cap) {
    (void)out;
    (void)cap;
    return 0;
}

/* Opens a capture session; returns a handle >= 0 or -1 (no SDK/device). */
int sm_decklink_open(int32_t subdevice_index, int enable_audio) {
    (void)subdevice_index;
    (void)enable_audio;
    return -1;
}

/* Dequeues a frame into caller buffers. Returns 1 frame, 0 none, -1 error. */
int sm_decklink_read_frame(int h, uint8_t *yuyv, int32_t cap,
                           int32_t *width, int32_t *height, double *pts_s) {
    (void)h; (void)yuyv; (void)cap; (void)width; (void)height; (void)pts_s;
    return -1;
}

int sm_decklink_close(int h) {
    (void)h;
    return -1;
}

} /* extern "C" */
