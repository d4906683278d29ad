/** WebView: embeds a registered web-renderer instance (wire: WebView). */
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneComponent } from '../component.js';
import { createSmelterComponent, sceneComponentIntoApi } from '../component.js';

export type WebViewProps = ComponentBaseProps & {
  /** Id the web renderer instance was registered with. */
  instanceId: Api.RendererId;
};

function sceneBuilder(props: WebViewProps, children: SceneComponent[]): Api.Component {
  return {
    type: 'web_view',
    id: props.id,
    children: children.map(sceneComponentIntoApi),
    instance_id: props.instanceId,
  };
}

const WebView = createSmelterComponent<WebViewProps>(sceneBuilder);
export default WebView;
