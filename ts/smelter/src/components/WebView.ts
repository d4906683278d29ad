/**
 * WebView — embeds a registered web-renderer instance.
 * Wire schema: smelter_tpu/api/schema.py `WebView` (reference behavior:
 * smelter-render/src/transformations/web_renderer.rs).
 */
import type * as Api from '../api.js';
import type { ComponentBaseProps } from '../scene.js';
import { sceneNodeFromSpec } from '../scene.js';

export type WebViewProps = ComponentBaseProps & {
  /** Id the web renderer instance was registered with. */
  instanceId: Api.RendererId;
};

const WebView = sceneNodeFromSpec<WebViewProps>('web_view', {
  rootFields: ['instanceId'],
});

export default WebView;
